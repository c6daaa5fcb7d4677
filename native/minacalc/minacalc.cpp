// minacalc.cpp — native 4K difficulty calculator (Etterna MSD algorithm),
// reimplemented compactly for the MuG Diffusion TPU framework.
//
// Algorithm surface mirrors the reference extension
// (ref: /root/reference/scripts/MinaCalc-1.0.tar.gz):
//   minacalc.calc_skill_set(rate, [(ms, col), ...][, goal]) -> 8 floats
//     (overall, stream, jumpstream, handstream, stamina, jackspeed,
//      chordjack, technical)                    [MinaCalcModule.cpp:11-61]
//   minacalc.version() -> int
//
// Core machinery reimplemented with the same constants and formulas:
//   * 0.5 s interval walk, 1500-interval / 50-rows-per-interval caps
//     [MinaCalc.h:24-30, UlbuAcolytes.h fast_walk_and_check_for_skip]
//   * NPS base = hand notes * finalscaler * 1.6, 2 points per tap
//     [SequencedBaseDiffCalc.h nps::actual_cancer]
//   * tech base: sqrt(sc_ms)*sqrt(cc_ms) / timing-variance factor, 2-window
//     smoothed, 4:9 weighted with NPS base [SequencedBaseDiffCalc.h techyo]
//   * anchor sequencing for jack difficulty (break on too slow/fast,
//     len-capped adjusted ms average) [GenericSequencing.h Anchor_Sequencing]
//   * agnostic pattern mods Stream/JS/HS/CJ/CJDensity with their shipped
//     parameter sets [Agnostic/HA_PatternMods/*.h]
//   * skillset assembly InitAdjDiff, stamina model StamAdjust, point-loss
//     Chisel binary search, grindscaler, sigmoidal overall aggregation
//     [MinaCalc.cpp]
//
// The long tail of situational pattern mods (OHJump, Roll, Trills, Chaos,
// FlamJam, WideRange*, RunningMan, TheThing) currently evaluates to the
// neutral 1.0 and is staged for later rounds; the pmod plumbing below keeps
// their slots so they can be added without structural change.

#include <algorithm>
#include <array>
#include <cassert>
#include <cmath>
#include <cstring>
#include <vector>

namespace mina {

// ---------------------------------------------------------------- constants

static const int kMaxIntervals = 1500;
static const int kMaxRowsPerInterval = 50;
static const float kIntervalSpan = 0.5f;
static const float kFinalScaler = 3.632f * 1.06f;
static const float kMaxRating = 100.f;
static const float kMinRating = 0.f;
static const float kDefaultScoreGoal = 0.93f;
static const float kLowAccCutoff = 0.9f;
static const float kSsrGoalCap = 0.965f;
static const float kSInit = -5.f;
static const float kMsInit = 5000.f;

enum Skillset {
  kOverall, kStream, kJumpstream, kHandstream, kStamina,
  kJackSpeed, kChordjack, kTechnical, kNumSkillsets,
};

// basescalers [UlbuAcolytes.h]
static const std::array<float, kNumSkillsets> kBaseScalers = {
    0.f, 0.93f, 0.885f, 0.84f, 0.925f, 0.91f, 0.8f, 0.83f};

enum Hand { kLeft = 0, kRight = 1, kNumHands = 2 };

enum PMod {
  kPmStream, kPmJS, kPmHS, kPmCJ, kPmCJDensity, kPmOHJump, kPmCJOHJump,
  kPmBalance, kPmRoll, kPmOHTrill, kPmVOHTrill, kPmChaos, kPmFlamJam,
  kPmWideRangeRoll, kPmWideRangeJumptrill, kPmWideRangeBalance,
  kPmWideRangeAnchor, kPmTheThing, kPmTheThing2, kPmRanMan, kNumPMods,
};

struct NoteInfo {
  unsigned notes;
  float row_time;  // seconds
};

template <typename T>
static inline T Clamp(T x, T lo, T hi) {
  return x > hi ? hi : (x < lo ? lo : x);
}
static inline float MsFrom(float now, float last) { return (now - last) * 1000.f; }
static inline float MsToNps(float ms) { return 1000.f / ms; }
static inline float MsToScaledNps(float ms) { return MsToNps(ms) * kFinalScaler; }

static inline int ColumnCount(unsigned notes) {
  return __builtin_popcount(notes & 0xFu);
}
static inline bool IsSingleTap(unsigned a) { return (a & (a - 1)) == 0; }

// --------------------------------------------------------- moving window

template <typename T>
struct MovingWindow {
  static const int kSize = 6;
  std::array<T, kSize> v{};
  void push(T x) {
    for (int i = 1; i < kSize; ++i) v[i - 1] = v[i];
    v[kSize - 1] = x;
  }
  void fill(T x) { v.fill(x); }
  T now() const { return v[kSize - 1]; }
  float mean_of(int w) const {
    float o = 0.f;
    for (int i = kSize - w; i < kSize; ++i) o += static_cast<float>(v[i]);
    return o / static_cast<float>(w);
  }
  float cv_of(int w) const {
    float avg = mean_of(w);
    float sd = 0.f;
    for (int i = kSize - w; i < kSize; ++i) {
      float d = static_cast<float>(v[i]) - avg;
      sd += d * d;
    }
    return std::sqrt(sd / static_cast<float>(w)) / avg;
  }
};

// --------------------------------------------------------- interval walk

struct RowInfo {
  unsigned notes = 0;
  int count = 0;
  std::array<int, kNumHands> hand_counts{{0, 0}};
  float time = 0.f;  // rate-scaled seconds
};

struct Calc {
  std::vector<std::array<RowInfo, kMaxRowsPerInterval>> rows;
  std::vector<int> itv_size;
  int numitv = 0;
  std::array<std::vector<int>, kNumHands> itv_points;
  // pattern mods per hand per interval
  std::array<std::array<std::vector<float>, kNumPMods>, kNumHands> doot;
  // base difficulties
  std::array<std::vector<float>, kNumHands> nps_base;
  std::array<std::vector<float>, kNumHands> tech_base;
  // adjusted difficulties per skillset
  std::array<std::array<std::vector<float>, kNumSkillsets>, kNumHands>
      base_adj_diff;
  std::array<std::array<std::vector<float>, kNumSkillsets>, kNumHands>
      base_diff_for_stam;
  std::vector<float> stam_adj_diff;
  std::array<std::vector<std::pair<float, float>>, kNumHands> jack_diff;
  float max_points = 0.f;
};

// returns true -> skip (junk file) [UlbuAcolytes.h:120-220]
static bool WalkRows(const std::vector<NoteInfo>& ni, float rate, Calc& c) {
  c.numitv = static_cast<int>(ni.back().row_time / rate / kIntervalSpan) + 1;
  if (c.numitv >= kMaxIntervals) return true;
  for (size_t i = 1; i < ni.size(); ++i)
    if (ni[i - 1].row_time >= ni[i].row_time) return true;

  c.rows.assign(c.numitv + 1, {});
  c.itv_size.assign(c.numitv + 1, 0);

  int itv = 0, last_itv = 0, row_counter = 0;
  for (const auto& r : ni) {
    if (row_counter >= kMaxRowsPerInterval) return true;
    float t = r.row_time / rate;
    itv = static_cast<int>(t / kIntervalSpan);
    if (itv > last_itv) {
      c.itv_size[last_itv] = row_counter;
      last_itv = itv;
      row_counter = 0;
    }
    RowInfo& out = c.rows[itv][row_counter];
    out.notes = r.notes;
    out.count = ColumnCount(r.notes);
    out.time = t;
    out.hand_counts[kLeft] =
        ((r.notes & 1u) ? 1 : 0) + ((r.notes & 2u) ? 1 : 0);
    out.hand_counts[kRight] =
        ((r.notes & 4u) ? 1 : 0) + ((r.notes & 8u) ? 1 : 0);
    ++row_counter;
  }
  c.itv_size[last_itv] = row_counter;
  c.numitv = last_itv + 1;
  return false;
}

// smoother [UlbuAcolytes.h Smooth]
static void Smooth(std::vector<float>& in, float neutral, int end) {
  float f2 = neutral, f3 = neutral;
  for (int i = 0; i < end; ++i) {
    float f1 = f2;
    f2 = f3;
    f3 = in[i];
    in[i] = (f1 + f2 + f3) / 3.f;
  }
}

// ------------------------------------------------ agnostic interval state

struct ItvInfo {
  int total_taps = 0;
  int chord_taps = 0;
  std::array<int, 4> taps_by_size{{0, 0, 0, 0}};
  int mixed_hs_density_tap_bonus = 0;
  void reset() {
    total_taps = chord_taps = mixed_hs_density_tap_bonus = 0;
    taps_by_size.fill(0);
  }
  void update(int row_count) {
    total_taps += row_count;
    if (row_count > 1) chord_taps += row_count;
    taps_by_size[row_count - 1] += row_count;
    if (taps_by_size[2] > 0) mixed_hs_density_tap_bonus += taps_by_size[1];
  }
};

struct MetaItvInfo {
  ItvInfo itvi;
  int seriously_not_js = 0;
  int definitely_not_jacks = 0;
  int actual_jacks = 0;
  int actual_jacks_cj = 0;
  int not_js = 0, not_hs = 0;
  int shared_chord_jacks = 0;
  bool dunk_it = false;
  std::array<unsigned, 3> row_variations{{0, 0, 0}};
  int num_var = 0;
  bool basically_vibro = true;
  void interval_end() {
    definitely_not_jacks = actual_jacks = actual_jacks_cj = 0;
    not_js = not_hs = shared_chord_jacks = 0;
    row_variations.fill(0);
    num_var = 0;
    basically_vibro = true;
    dunk_it = false;
    itvi.reset();
  }
};

// row-pair sequencing [Agnostic/MetaRowInfo.h]
struct MetaRowInfo {
  float time = kSInit;
  int count = 0, last_count = 0;
  unsigned notes = 0, last_notes = 0, last_last_notes = 0;

  static bool AltChordStream(unsigned a, unsigned b, unsigned c) {
    if (IsSingleTap(a)) {
      if (IsSingleTap(b)) return false;
      if (!IsSingleTap(c)) return false;
    } else {
      if (!IsSingleTap(b)) return false;
      if (IsSingleTap(c)) return false;
    }
    return !(((a & b) != 0u) && ((b & c) != 0u));
  }

  void advance(MetaItvInfo& m, float row_time, int row_count,
               unsigned row_notes) {
    last_last_notes = last_notes;
    last_notes = notes;
    notes = row_notes;
    last_count = count;
    count = row_count;
    time = row_time;
    m.itvi.update(count);

    // jack scan
    bool twas_jack = false;
    for (unsigned id : {1u, 2u, 4u, 8u}) {
      if ((id & notes) && (id & last_notes)) {
        ++m.actual_jacks;
        twas_jack = true;
        if (count > 1 && ColumnCount(last_notes) > 1) ++m.shared_chord_jacks;
      }
    }
    if (twas_jack) ++m.actual_jacks_cj;

    // row variations (vibro detection)
    if (m.basically_vibro) {
      for (auto& t : m.row_variations) {
        if (t != 0) {
          if (t == notes) break;
        } else {
          t = notes;
          ++m.num_var;
          if (m.row_variations[2] != 0) m.basically_vibro = false;
          break;
        }
      }
    }

    if (AltChordStream(notes, last_notes, last_last_notes))
      ++m.definitely_not_jacks;

    bool alt_chord_single =
        (count > 1 && last_count == 1) || (count == 1 && last_count > 1);
    if (alt_chord_single && !twas_jack) m.seriously_not_js -= 3;

    if (last_count == 1 && count == 1) {
      m.seriously_not_js = std::max(0, m.seriously_not_js);
      ++m.seriously_not_js;
      if (m.seriously_not_js > 3) {
        m.not_js += m.seriously_not_js;
        m.not_hs += m.seriously_not_js;
      }
    } else if (last_count > 1 && count > 1) {
      m.not_hs += count;
      m.not_js += count;
      if ((notes & last_notes) == 0) {
        ++m.not_hs;
        ++m.not_js;
      }
    }
    if ((notes & last_notes) == 0 && count > 1 && last_count > 1) {
      // uses row before last: approximation of dunk detection
      if ((last_notes & last_last_notes) == 0 && last_count > 1)
        m.dunk_it = true;
    }
  }
};

// --------------------------------------------------- agnostic pattern mods

// StreamMod [Agnostic/HA_PatternMods/Stream.h]
static float StreamMod(const MetaItvInfo& m) {
  const auto& i = m.itvi;
  if (i.total_taps < 2) return 1.f;
  if (i.taps_by_size[0] == 0) return 0.6f;
  float prop = (i.taps_by_size[0] + 1.f) / (i.total_taps - 1.f) * 1.41f;
  float jack = Clamp(4.f - m.actual_jacks, 0.5f, 1.f);
  float pmod = Clamp(std::sqrt(prop * jack), 0.6f, 1.0f);
  if (m.basically_vibro) {
    if (m.num_var == 1) pmod *= 0.5f;
    else if (m.num_var == 2) pmod *= 0.9f;
    else if (m.num_var == 3) pmod *= 0.95f;
  }
  return pmod;
}

// JSMod with decay [Agnostic/HA_PatternMods/JS.h]
struct JSModState {
  float last_mod = 0.6f;
  float operator()(const MetaItvInfo& m) {
    const auto& i = m.itvi;
    if (i.total_taps == 0) return 1.f;
    if (i.taps_by_size[1] == 0) {
      last_mod = Clamp(last_mod - 0.05f, 0.6f, 1.1f);
      return last_mod;
    }
    float t = static_cast<float>(i.total_taps);
    float total_prop = (i.taps_by_size[1] + 1.f) / (t - 1.f) * 2.714f;
    total_prop = Clamp(std::sqrt(total_prop), 0.6f, 1.1f);
    float jumptrill = Clamp(1.5f - (m.not_js / t), 0.9f, 1.f);
    float jack = Clamp(1.35f - (m.actual_jacks / t), 0.5f, 1.f);
    float pmod = Clamp(total_prop * jumptrill * jack, 0.6f, 1.1f);
    if (m.dunk_it) pmod *= 0.99f;
    last_mod = pmod;
    return pmod;
  }
};

// HSMod with decay [Agnostic/HA_PatternMods/HS.h]
struct HSModState {
  float last_mod = 0.6f;
  float operator()(const MetaItvInfo& m) {
    const auto& i = m.itvi;
    if (i.total_taps == 0) return 1.f;
    if (i.taps_by_size[2] == 0) {
      last_mod = Clamp(last_mod - 0.05f, 0.6f, 1.1f);
      return last_mod;
    }
    float t = static_cast<float>(i.total_taps);
    float total_prop =
        0.4f + ((i.taps_by_size[2] + i.mixed_hs_density_tap_bonus + 1.f) /
                (t - 1.f) * 5.571f);
    total_prop = Clamp(std::sqrt(total_prop), 0.6f, 1.1f);
    float jumptrill = Clamp(1.6f - (m.not_hs / t), 0.89f, 1.f);
    float jack = Clamp(1.35f - (m.actual_jacks / t), 0.5f, 1.f);
    float pmod = Clamp(total_prop * jumptrill * jack, 0.6f, 1.1f);
    if (m.dunk_it) pmod *= 0.99f;
    last_mod = pmod;
    return pmod;
  }
};

// CJMod [Agnostic/HA_PatternMods/CJ.h]
static float CJMod(const MetaItvInfo& m) {
  const auto& i = m.itvi;
  if (i.total_taps == 0) return 1.f;
  if (i.chord_taps == 0) return 0.6f;
  float t = static_cast<float>(i.total_taps);
  float total_prop = (i.chord_taps + 1.f) / (t - 1.f) * 5.428f;
  total_prop = Clamp(std::sqrt(total_prop), 0.6f, 1.1f);
  float jack = Clamp(static_cast<float>(m.actual_jacks_cj) - 1.f, 0.625f, 1.f);
  float not_jack =
      Clamp(1.15f - (m.definitely_not_jacks * 1.75f / t), 0.4f, 1.f);
  float pmod = Clamp(total_prop * jack * not_jack, 0.6f, 1.1f);
  if (m.basically_vibro) {
    if (m.num_var == 1) pmod *= 0.5f;
    else if (m.num_var == 2) pmod *= 0.9f;
    else if (m.num_var == 3) pmod *= 0.95f;
  }
  return pmod;
}

// CJDensityMod [Agnostic/HA_PatternMods/CJDensity.h]
static float CJDensityMod(const MetaItvInfo& m) {
  const auto& i = m.itvi;
  if (i.total_taps == 0) return 1.f;
  float t = static_cast<float>(i.total_taps);
  float a = (i.taps_by_size[0] * 2.f + i.taps_by_size[1] * 1.2f +
             i.taps_by_size[2] * 0.95f + i.taps_by_size[3] * 0.95f) / t;
  return Clamp(std::sqrt(a), 0.85f, 1.15f);
}

// -------------------------------------------------- hand-dependent sequencing

enum ColType { kColLeft, kColRight, kColOHJump, kColEmpty, kColInit };

static ColType DetermineColType(unsigned notes, unsigned hand_id) {
  unsigned shirt = notes & hand_id;
  if (shirt == 0) return kColEmpty;
  if (hand_id == 3u) {
    if (shirt == 3u) return kColOHJump;
    return shirt == 1u ? kColLeft : kColRight;
  }
  // hand_id == 12
  if (shirt == 12u) return kColOHJump;
  return shirt == 4u ? kColLeft : kColRight;
}

// Anchor_Sequencing [GenericSequencing.h]
struct AnchorSeq {
  int len = 1;
  float sc_ms = kMsInit;
  float max_ms = kMsInit;
  float len_cap_ms = kMsInit;
  float last = kSInit;
  float start = kSInit;
  bool init = true;

  void reset() {
    len = 1;
    sc_ms = max_ms = len_cap_ms = kMsInit;
    last = start = kSInit;
    init = true;
  }

  void advance(float now) {
    sc_ms = MsFrom(now, last);
    if (init) {
      init = false;
      last = now;
      max_ms = sc_ms;
      return;
    }
    if (sc_ms > max_ms + 10.f || sc_ms * 2.34f < max_ms) {
      start = last;
      len = 2;
    } else {
      ++len;
    }
    max_ms = sc_ms;
    last = now;
  }

  float get_ms() {
    static const int len_cap = 5;
    if (len > len_cap) return len_cap_ms;
    float total_ms = MsFrom(last, start);
    float l = static_cast<float>(len - 1);
    float avg_ms = total_ms / l;
    float adj_total = total_ms + 25.f + avg_ms * 1.075f;
    float ms = adj_total / l;
    if (len == 2) {
      ms *= 1.1f;
      ms = std::max(ms, 155.f);
    }
    ms = std::max(ms, 82.5f);
    if (len == len_cap) len_cap_ms = ms;
    return ms;
  }
};

struct Sequencer {
  std::array<AnchorSeq, 2> anch;
  MovingWindow<float> mw_any_ms;
  MovingWindow<float> mw_cc_ms;
  std::array<MovingWindow<float>, 2> mw_sc_ms;

  void reset() {
    anch[0].reset();
    anch[1].reset();
    mw_any_ms.fill(kMsInit);
    mw_cc_ms.fill(kMsInit);
    mw_sc_ms[0].fill(kMsInit);
    mw_sc_ms[1].fill(kMsInit);
  }

  void advance(ColType ct, float row_time, float any_ms) {
    if (ct == kColLeft || ct == kColRight) {
      anch[ct].advance(row_time);
      mw_sc_ms[ct].push(anch[ct].sc_ms);
      // cc from the other column's last
      mw_cc_ms.push(MsFrom(row_time, anch[ct == kColLeft ? 1 : 0].last));
    } else if (ct == kColOHJump) {
      anch[0].advance(row_time);
      anch[1].advance(row_time);
      mw_sc_ms[0].push(anch[0].sc_ms);
      mw_sc_ms[1].push(anch[1].sc_ms);
      mw_cc_ms.push(sc_ms_now(kColOHJump));
    }
    mw_any_ms.push(any_ms);
  }

  float sc_ms_now(ColType ct, bool lower = true) const {
    if (ct == kColInit) return kMsInit;
    if (ct == kColOHJump) {
      float a = mw_sc_ms[0].now(), b = mw_sc_ms[1].now();
      return lower ? std::min(a, b) : std::max(a, b);
    }
    return mw_sc_ms[ct].now();
  }

  float lowest_anchor_ms() {
    return std::min(anch[0].get_ms(), anch[1].get_ms());
  }
};

// techyo [SequencedBaseDiffCalc.h]
struct TechBase {
  std::array<float, kMaxRowsPerInterval> tc_static{};
  int row_counter = 0;
  MovingWindow<float> teehee;

  void reset() {
    row_counter = 0;
    teehee.fill(0.f);
  }

  void advance(const Sequencer& seq, ColType ct) {
    if (row_counter >= kMaxRowsPerInterval) return;
    float a = seq.sc_ms_now(ct);
    float b = (ct == kColOHJump) ? seq.sc_ms_now(ct, false) : seq.mw_cc_ms.now();
    float c = std::sqrt(a) * std::sqrt(b);

    float pineapple = Clamp(seq.mw_any_ms.cv_of(4) + 0.5f, 0.5f, 1.5f);
    float porcupine = Clamp(seq.mw_sc_ms[0].cv_of(4) + 0.5f, 0.5f, 1.5f);
    float sequins = Clamp(seq.mw_sc_ms[1].cv_of(4) + 0.5f, 0.5f, 1.5f);

    float sco = seq.mw_sc_ms[0].now();
    float pol = seq.mw_sc_ms[1].now();
    float obliosis = (ct == kColLeft) ? pol / sco : sco / pol;
    obliosis = Clamp(obliosis, 1.f, 10.f);
    float hi = std::max(sco, pol), lo = std::min(sco, pol);
    float pewp = std::sqrt(hi / lo - 1.f) / obliosis;
    float vertebrae =
        Clamp((pineapple + porcupine + sequins) / 3.f + pewp, 0.5f, 1.5f);

    teehee.push(c / vertebrae);
    tc_static[row_counter] = teehee.mean_of(2);
    ++row_counter;
  }

  float itv_diff(float nps_base) const {
    if (row_counter == 0) return std::max(0.f, nps_base * 4.f / 9.f);
    float total = 0.f;
    for (int i = 0; i < row_counter; ++i) total += tc_static[i];
    float ms_mean = total / static_cast<float>(row_counter);
    float tc = MsToScaledNps(ms_mean);
    // weighted_average(tc, nps, 4, 9)
    return (4.f * tc + 5.f * nps_base) / 9.f;
  }

  void interval_end() { row_counter = 0; }
};

// ----------------------------------------------------------- main pipeline

static void RunPatternMods(Calc& c) {
  // agnostic loop [Ulbu.h run_agnostic_pmod_loop]
  MetaItvInfo mitvi;
  MetaRowInfo mri;
  JSModState js;
  HSModState hs;
  for (int h = 0; h < kNumHands; ++h)
    for (int p = 0; p < kNumPMods; ++p)
      c.doot[h][p].assign(c.numitv, 1.f);

  for (int itv = 0; itv < c.numitv; ++itv) {
    for (int row = 0; row < c.itv_size[itv]; ++row) {
      const RowInfo& ri = c.rows[itv][row];
      mri.advance(mitvi, ri.time, ri.count, ri.notes);
    }
    c.doot[kLeft][kPmStream][itv] = StreamMod(mitvi);
    c.doot[kLeft][kPmJS][itv] = js(mitvi);
    c.doot[kLeft][kPmHS][itv] = hs(mitvi);
    c.doot[kLeft][kPmCJ][itv] = CJMod(mitvi);
    c.doot[kLeft][kPmCJDensity][itv] = CJDensityMod(mitvi);
    mitvi.interval_end();
  }
  for (int p : {kPmStream, kPmJS, kPmHS, kPmCJ, kPmCJDensity})
    Smooth(c.doot[kLeft][p], 1.f, c.numitv);
  for (int p : {kPmStream, kPmJS, kPmHS, kPmCJ, kPmCJDensity})
    c.doot[kRight][p] = c.doot[kLeft][p];

  // dependent loop [Ulbu.h run_dependent_pmod_loop]
  static const std::array<unsigned, kNumHands> hand_ids = {3u, 12u};
  for (int h = 0; h < kNumHands; ++h) {
    // nps base + points [SequencedBaseDiffCalc.h nps::actual_cancer]
    c.nps_base[h].assign(c.numitv, 0.f);
    c.tech_base[h].assign(c.numitv, 0.f);
    c.itv_points[h].assign(c.numitv, 0);
    for (int itv = 0; itv < c.numitv; ++itv) {
      int notes = 0;
      for (int row = 0; row < c.itv_size[itv]; ++row)
        notes += c.rows[itv][row].hand_counts[h];
      c.nps_base[h][itv] = notes * kFinalScaler * 1.6f;
      c.itv_points[h][itv] = notes * 2;
    }
    Smooth(c.nps_base[h], 0.f, c.numitv);

    Sequencer seq;
    seq.reset();
    TechBase tech;
    tech.reset();
    c.jack_diff[h].clear();

    float last_row_time = kSInit;
    for (int itv = 0; itv < c.numitv; ++itv) {
      for (int row = 0; row < c.itv_size[itv]; ++row) {
        const RowInfo& ri = c.rows[itv][row];
        ColType ct = DetermineColType(ri.notes, hand_ids[h]);
        if (ct == kColEmpty) continue;
        float any_ms = MsFrom(ri.time, last_row_time);
        seq.advance(ct, ri.time, any_ms);
        tech.advance(seq, ct);
        // jack difficulty per row [Ulbu.h update_sequenced_base_diffs]
        c.jack_diff[h].push_back(
            {ri.time,
             MsToScaledNps(seq.lowest_anchor_ms()) * kBaseScalers[kJackSpeed]});
        last_row_time = ri.time;
      }
      c.tech_base[h][itv] = tech.itv_diff(c.nps_base[h][itv]);
      tech.interval_end();
    }
  }
}

// InitAdjDiff [MinaCalc.cpp:617-805]
static void InitAdjDiff(Calc& c) {
  static const std::array<std::vector<int>, kNumSkillsets> pmods_used = {{
      {},  // overall
      {kPmStream, kPmOHTrill, kPmVOHTrill, kPmChaos, kPmWideRangeRoll,
       kPmWideRangeJumptrill, kPmFlamJam, kPmOHJump, kPmBalance,
       kPmWideRangeBalance},  // stream
      {kPmJS, kPmOHJump, kPmChaos, kPmBalance, kPmTheThing, kPmTheThing2,
       kPmWideRangeBalance, kPmWideRangeJumptrill, kPmVOHTrill,
       kPmRanMan},  // js
      {kPmHS, kPmOHJump, kPmTheThing, kPmWideRangeAnchor, kPmWideRangeRoll,
       kPmWideRangeJumptrill, kPmOHTrill, kPmVOHTrill},  // hs
      {},  // stam
      {},  // jackspeed
      {kPmCJ, kPmCJDensity, kPmVOHTrill, kPmWideRangeAnchor},  // chordjack
      {kPmOHTrill, kPmVOHTrill, kPmBalance, kPmOHJump, kPmChaos,
       kPmWideRangeJumptrill, kPmWideRangeBalance, kPmWideRangeRoll,
       kPmFlamJam, kPmRanMan, kPmTheThing, kPmTheThing2},  // technical
  }};

  for (int h = 0; h < kNumHands; ++h) {
    for (int ss = 0; ss < kNumSkillsets; ++ss) {
      c.base_adj_diff[h][ss].assign(c.numitv, 0.f);
      c.base_diff_for_stam[h][ss].assign(c.numitv, 0.f);
    }
    for (int i = 0; i < c.numitv; ++i) {
      std::array<float, kNumSkillsets> tp_mods;
      tp_mods.fill(1.f);
      for (int ss = 0; ss < kNumSkillsets; ++ss)
        for (int pm : pmods_used[ss]) tp_mods[ss] *= c.doot[h][pm][i];

      for (int ss = 0; ss < kNumSkillsets; ++ss) {
        if (ss == kOverall || ss == kStamina) continue;
        float funk = c.nps_base[h][i] * tp_mods[ss] * kBaseScalers[ss];
        float adj = funk;
        float stam_base = funk;
        switch (ss) {
          case kJumpstream: {
            adj /= std::max(c.doot[h][kPmHS][i], 1.f);
            adj /= std::sqrt(c.doot[h][kPmOHJump][i] * 0.95f);
            adj *= std::min(1.f, std::sqrt(c.doot[h][kPmWideRangeRoll][i] + 0.1f));
            float b = c.nps_base[h][i] * tp_mods[kHandstream];
            stam_base = std::max(adj, b);
          } break;
          case kHandstream: {
            float b = c.nps_base[h][i] * tp_mods[kJumpstream];
            stam_base = std::max(funk, b);
          } break;
          case kChordjack:
            adj *= std::sqrt(c.doot[h][kPmCJOHJump][i]);
            break;
          case kTechnical:
            adj = c.tech_base[h][i] * tp_mods[ss] * kBaseScalers[ss] /
                  std::max(c.doot[h][kPmCJ][i] * c.doot[h][kPmCJ][i], 1.f) /
                  std::sqrt(c.doot[h][kPmOHJump][i]);
            break;
          default:
            break;
        }
        c.base_adj_diff[h][ss][i] = adj;
        c.base_diff_for_stam[h][ss][i] = stam_base;
      }
    }
    Smooth(c.base_adj_diff[h][kChordjack], 1.f, c.numitv);
  }
}

// StamAdjust [MinaCalc.cpp:215-280]
static void StamAdjust(float x, int ss, Calc& c, int h) {
  static const float stam_ceil = 1.075234f;
  static const float stam_mag = 243.f;
  static const float stam_fscale = 500.f;
  static const float stam_prop = 0.69424f;
  float stam_floor = 0.95f;
  float mod = 0.95f;
  float avs2 = 0.f;
  const float super_stam_ceil = 1.11f;
  c.stam_adj_diff.assign(c.numitv, 0.f);
  for (int i = 0; i < c.numitv; ++i) {
    float avs1 = avs2;
    avs2 = c.base_diff_for_stam[h][ss][i];
    mod += ((((avs1 + avs2) / 2.f) / (stam_prop * x)) - 1.f) / stam_mag;
    if (mod > 0.95f) stam_floor += (mod - 0.95f) / stam_fscale;
    float local_ceil = stam_ceil * stam_floor;
    mod = std::min(Clamp(mod, stam_floor, local_ceil), super_stam_ceil);
    c.stam_adj_diff[i] = c.base_adj_diff[h][ss][i] * mod;
  }
}

// JackStamAdjust [MinaCalc.cpp:283-322]
static std::vector<std::pair<float, float>> JackStamAdjust(float x, Calc& c,
                                                           int h) {
  static const float stam_ceil = 1.05234f;
  static const float stam_mag = 23.f;
  static const float stam_fscale = 2150.f;
  static const float stam_prop = 0.49424f;
  float stam_floor = 0.95f;
  float mod = 0.95f;
  float avs2 = 0.f;
  const float super_stam_ceil = 1.09f;
  const auto& diff = c.jack_diff[h];
  std::vector<std::pair<float, float>> out(diff.size());
  for (size_t i = 0; i < diff.size(); ++i) {
    float avs1 = avs2;
    avs2 = diff[i].second;
    mod += ((((avs1 + avs2) / 2.f) / (stam_prop * x)) - 1.f) / stam_mag;
    if (mod > 0.95f) stam_floor += (mod - 0.95f) / stam_fscale;
    float local_ceil = stam_ceil * stam_floor;
    mod = std::min(Clamp(mod, stam_floor, local_ceil), super_stam_ceil);
    out[i] = {diff[i].first, diff[i].second * mod};
  }
  return out;
}

// jackloss [MinaCalc.cpp:326-380]
static float JackLoss(float x, Calc& c, int h, bool stam) {
  const auto v = stam ? JackStamAdjust(x, c, h) : c.jack_diff[h];
  float total = 0.f;
  for (const auto& y : v) {
    if (x < y.second && y.second > 0.f) {
      total += std::max(static_cast<float>(16.f * erf(0.04f * (y.second - x))),
                        0.f);
    }
  }
  return total;
}

// CalcInternal point loss [MinaCalc.cpp:385-440]
static void CalcInternal(float& gotpoints, float x, int ss, bool stam, Calc& c,
                         int h) {
  if (stam) StamAdjust(x, ss, c, h);
  const std::vector<float>& v =
      stam ? c.stam_adj_diff : c.base_adj_diff[h][ss];
  for (int i = 0; i < c.numitv; ++i) {
    if (x < v[i]) {
      float pts = static_cast<float>(c.itv_points[h][i]);
      gotpoints -= (pts - pts * std::pow(x / v[i], 1.7f));
    }
  }
}

// Chisel [MinaCalc.cpp:500-615]
static float Chisel(float player_skill, float resolution, float score_goal,
                    int ss, bool stamina, Calc& c) {
  float gotpoints = 0.f;
  const float reqpoints = c.max_points * score_goal;
  const float tech_jack_cap = c.max_points * 0.1f;
  for (int iter = 1; iter <= 8; ++iter) {
    do {
      if (player_skill > kMaxRating || ss == kOverall || ss == kStamina)
        return kMinRating;
      player_skill += resolution;
      switch (ss) {
        case kTechnical: gotpoints = c.max_points * 1.f; break;
        case kJackSpeed: gotpoints = c.max_points * 1.0175f; break;
        case kStream: gotpoints = c.max_points * 1.01f; break;
        default: gotpoints = c.max_points * 1.05f; break;
      }
      for (int h = 0; h < kNumHands; ++h) {
        if (gotpoints > reqpoints) {
          if (ss == kJackSpeed) {
            gotpoints -= JackLoss(player_skill, c, h, stamina);
          } else {
            CalcInternal(gotpoints, player_skill, ss, stamina, c, h);
          }
          if (ss == kTechnical) {
            gotpoints -= std::sqrt(std::min(
                tech_jack_cap,
                JackLoss(player_skill * 0.75f, c, h, stamina) * 0.85f));
          }
        }
      }
    } while (gotpoints < reqpoints);
    player_skill -= resolution;
    resolution /= 2.f;
  }
  return player_skill + 2.f * resolution;
}

static float DownscaleLowAccuracy(float f, float sg) {
  return sg >= kLowAccCutoff
             ? f
             : Clamp(f / std::pow(1.f + (kLowAccCutoff - sg), 1.25f),
                     kMinRating, kMaxRating);
}

// AggregateRatings [MinaCalcHelpers.h]
static float AggregateRatings(const std::vector<float>& skillsets,
                              float rating = 0.f, float res = 10.24f,
                              int iter = 1) {
  double sum;
  do {
    rating += res;
    sum = 0.0;
    for (float ss : skillsets)
      sum += std::max(0.0, 2.0 / erfc(0.25 * (ss - rating)) - 2.0);
  } while (std::pow(2, rating * 0.1) < sum);
  if (iter == 11) return rating * 1.11f;
  return AggregateRatings(skillsets, rating - res, res / 2.f, iter + 1);
}

// CalcMain [MinaCalc.cpp:46-210]
std::vector<float> CalcSkillSets(const std::vector<NoteInfo>& note_info,
                                 float music_rate, float score_goal) {
  std::vector<float> zeros(kNumSkillsets, kMinRating);
  if (note_info.size() <= 1) return zeros;
  score_goal = std::min(score_goal, kSsrGoalCap);

  float last_t = note_info.back().row_time / music_rate;
  float grindscaler = Clamp(0.9f + 0.1f * (last_t - 35.f) / 35.f, 0.9f, 1.f) *
                      Clamp(0.9f + 0.1f * (last_t - 15.f) / 15.f, 0.9f, 1.f) *
                      Clamp(0.4f + 0.6f * (last_t - 10.f) / 10.f, 0.4f, 1.f);

  Calc c;
  if (WalkRows(note_info, music_rate, c)) return zeros;
  RunPatternMods(c);
  InitAdjDiff(c);

  float max_points = 0.f;
  for (int i = 0; i < c.numitv; ++i)
    max_points += c.itv_points[kLeft][i] + c.itv_points[kRight][i];
  c.max_points = max_points;

  std::vector<float> r(kNumSkillsets, 0.f);
  for (int ss = 0; ss < kNumSkillsets; ++ss)
    r[ss] = Chisel(0.1f, 10.24f, score_goal, ss, false, c);

  int highest_base = 0;
  for (int ss = 1; ss < kNumSkillsets; ++ss)
    if (r[ss] > r[highest_base]) highest_base = ss;
  float base = r[highest_base];

  for (int ss = 0; ss < kNumSkillsets; ++ss)
    r[ss] = Chisel(r[ss] * 0.9f, 0.32f, score_goal, ss, true, c);

  int highest_stam = 0;
  for (int ss = 1; ss < kNumSkillsets; ++ss)
    if (r[ss] > r[highest_stam]) highest_stam = ss;

  float poodle = r[highest_base];
  if (highest_stam == kJackSpeed) poodle *= 0.8f;

  float stam_mult = std::pow(poodle / base - 0.015f, 2.5f);
  stam_mult = Clamp(stam_mult, 0.8f, 1.08f);
  r[kStamina] = poodle * stam_mult * kBaseScalers[kStamina];

  // ssr cap + low accuracy downscale
  static const float ssrcap = 40.f;
  for (auto& v : r) {
    v = DownscaleLowAccuracy(v, score_goal);
    v = Clamp(v, v, ssrcap);
    if (highest_stam == kJackSpeed) v = DownscaleLowAccuracy(v, score_goal);
  }

  float agg = AggregateRatings(r);
  float highest = *std::max_element(r.begin(), r.end());
  r[kOverall] = agg > highest ? agg : highest;

  for (auto& v : r) v *= grindscaler;
  return r;
}

int CalcVersion() { return 434; }

}  // namespace mina

// ------------------------------------------------------- CPython binding
// (same module API as ref MinaCalcModule.cpp)

#include <Python.h>

static PyObject* method_version(PyObject*, PyObject*) {
  return PyLong_FromLong(mina::CalcVersion());
}

static PyObject* method_calc_skill_set(PyObject*, PyObject* args) {
  float rate = 0.f, score_goal = mina::kDefaultScoreGoal;
  PyObject* note_buff = nullptr;
  if (!PyArg_ParseTuple(args, "fO|f", &rate, &note_buff, &score_goal))
    return nullptr;
  Py_ssize_t size = PyList_Size(note_buff);

  // aggregate (ms, col) tuples into bitmask rows (ref MinaCalcModule.cpp)
  std::vector<mina::NoteInfo> rows;
  rows.reserve(size);
  long current_time = -1;
  unsigned current_notes = 0;
  for (Py_ssize_t i = 0; i < size; ++i) {
    PyObject* tup = PyList_GetItem(note_buff, i);
    long time_ms = PyLong_AsLong(PyTuple_GetItem(tup, 0));
    long column = PyLong_AsLong(PyTuple_GetItem(tup, 1));
    if (current_time != time_ms) {
      if (current_notes != 0) {
        rows.push_back({current_notes, current_time / 1000.f});
        current_notes = 0;
      }
      current_time = time_ms;
    }
    current_notes |= 1u << column;
  }
  if (current_notes != 0) rows.push_back({current_notes, current_time / 1000.f});

  std::vector<float> ssr;
  Py_BEGIN_ALLOW_THREADS
  ssr = mina::CalcSkillSets(rows, rate, score_goal);
  Py_END_ALLOW_THREADS

  PyObject* out = PyTuple_New(ssr.size());
  for (size_t i = 0; i < ssr.size(); ++i)
    PyTuple_SetItem(out, i, PyFloat_FromDouble(ssr[i]));
  return out;
}

static PyMethodDef MinaCalcMethods[] = {
    {"version", method_version, METH_VARARGS, "MinaCalc version"},
    {"calc_skill_set", method_calc_skill_set, METH_VARARGS,
     "Calculate the 8 MSD skillset ratings for a 4K note list"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef minacalc_module = {
    PyModuleDef_HEAD_INIT, "minacalc",
    "Native MSD difficulty calculator (Etterna algorithm, reimplemented)",
    -1, MinaCalcMethods};

PyMODINIT_FUNC PyInit_minacalc(void) {
  return PyModule_Create(&minacalc_module);
}
