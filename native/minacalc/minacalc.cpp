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
//   * dependent pattern mods OHJump/CJOHJump (sequence+prop components),
//     Balance, OHTrill/VOHTrill (cv-gated trill runs), Chaos (polyrhythm
//     fractional-ratio window), WideRangeBalance/Anchor/Roll/Jumptrill
//     (timing-checked jumptrillables), FlamJam (flam group sequencing)
//     [Dependent/HD_PatternMods/*.h, Agnostic/HA_PatternMods/FlamJam.h]
//
//   * RunningMan sequencing + mod [Dependent/HD_Sequencers/RMSequencing.h,
//     HD_PatternMods/RunningMan.h] and TheThing1/2 jumptrillable detection
//     [Agnostic/HA_Sequencers/ThingSequencing.h] — fully implemented
//
// Parity: bitwise-identical MSD (worst diff 0.0000) and 100% dominant-
// pattern-flag agreement vs the reference extension across a 112-chart x
// 9-rate corpus including adversarial regimes (interval-cap marathons,
// 50-row interval saturation, quad walls, single-column vibro, sub-ms
// duplicate rows, rates 0.5-2.0)
// (tests/test_minacalc.py::test_parity_corpus_msd_within_005), including
// reference quirks preserved on purpose: int-abs truncation in ChaosMod,
// double left-hand smoothing, cc_taps zeroed before OHJ/CJOHJ evaluation,
// the approximate fastpow in Chisel point-loss, the FlamJam neutral-latch
// (no interval reset on the early return), the stale last_passed_check in
// WideRangeRoll's ccsjjscc checks, and the cross-hand leaks of OHT/VOHT
// _mw_oht_taps and RunningMan ran_taps/ot_sh_len (mods are constructed
// once and full_reset per hand, exactly like Ulbu.h full_hand_reset).
// (RollMod is a no-op in the reference and stays neutral here.)

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

// Approximate pow via exponent-bit manipulation, matching the reference's
// fastpow exactly [PatternModHelpers.h:15-25] ("significantly inaccurate" by
// its own admission, but it shapes every Chisel point-loss curve, so parity
// requires the same approximation bit-for-bit).
static inline float FastPow(double a, double b) {
  int u[2];
  std::memcpy(&u, &a, sizeof a);
  u[1] = static_cast<int>(b * (u[1] - 1072632447) + 1072632447);
  u[0] = 0;
  std::memcpy(&a, &u, sizeof a);
  return static_cast<float>(a);
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
  void zero() { v.fill(static_cast<T>(0)); }
  T now() const { return v[kSize - 1]; }
  T last() const { return v[kSize - 2]; }
  T total_of(int w) const {
    T o = static_cast<T>(0);
    for (int i = kSize - w; i < kSize; ++i) o += v[i];
    return o;
  }
  T max_of(int w) const {
    T o = static_cast<T>(0);
    for (int i = kSize - w; i < kSize; ++i) o = std::max(o, v[i]);
    return o;
  }
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
  // timing checks over the newest 3 values [CalcWindow.h:120-195]
  bool ccacc_check(float factor, float threshold) {
    v[4] /= factor;
    float o = cv_of(3);
    v[4] *= factor;
    return o < threshold;
  }
  bool acca_check(float factor, float threshold) {
    v[4] *= factor;
    float o = cv_of(3);
    v[4] /= factor;
    return o < threshold;
  }
  bool roll_check(float factor, float threshold) {
    return (v[4] > v[5]) ? ccacc_check(factor, threshold)
                         : acca_check(factor, threshold);
  }
};

static inline float CvOf3(float a, float b, float c) {
  float avg = (a + b + c) / 3.f;
  float sd = (a - avg) * (a - avg) + (b - avg) * (b - avg) +
             (c - avg) * (c - avg);
  return std::sqrt(sd / 3.f) / avg;
}
static inline float CvOf4(float a, float b, float c, float d) {
  float avg = (a + b + c + d) / 4.f;
  float sd = (a - avg) * (a - avg) + (b - avg) * (b - avg) +
             (c - avg) * (c - avg) + (d - avg) * (d - avg);
  return std::sqrt(sd / 4.f) / avg;
}

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
  float ms_now = kMsInit;
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
    ms_now = MsFrom(row_time, time);
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

// ------------------------------------------------------ FlamJam (agnostic)

// FJ_Sequencer + FlamJamMod [Agnostic/HA_Sequencers/FlamSequencing.h,
// Agnostic/HA_PatternMods/FlamJam.h]
struct FlamJam {
  static constexpr float kGroupTol = 35.f;
  static constexpr float kStepTol = 17.5f;
  static constexpr float kScaler = 2.75f;

  unsigned seen = 0;
  int size = 1;
  bool flammin = false;
  std::array<float, 3> ms{{0, 0, 0}};

  int flam_counter = 0;
  std::array<float, 4> mod_parts{{1, 1, 1, 1}};
  bool fifth_flammament = false;

  float dur() const {
    float d = 0;
    for (int i = 0; i < size - 1; ++i) d += ms[i];
    return d;
  }
  float mod_part() {
    float dur_prop = dur() / kGroupTol;
    dur_prop /= (static_cast<float>(size) / kScaler);
    return std::sqrt(Clamp(dur_prop, 0.f, 1.f));
  }
  void grow(float ms_now, unsigned notes) {
    if (size == 4) return;
    seen |= notes;
    ms[size - 1] = ms_now;
    ++size;
  }
  void start(float ms_now, unsigned notes) {
    flammin = true;
    seen = 0;
    grow(ms_now, notes);
  }
  void complete_seq() {
    if (flam_counter < 4) {
      mod_parts[flam_counter] = mod_part();
      ++flam_counter;
    } else {
      fifth_flammament = true;
    }
    flammin = false;
    size = 1;
  }
  void advance(float ms_now, unsigned notes) {
    if (fifth_flammament) return;
    if (!flammin) {
      if (ms_now > kStepTol) return;
      start(ms_now, notes);
    } else {
      bool tol_ok = !(ms_now > kGroupTol) && !(dur() + ms_now > kGroupTol);
      if (tol_ok) {
        if ((seen & notes) == 0) {
          grow(ms_now, notes);
        } else {
          complete_seq();
          start(ms_now, notes);
        }
      } else {
        complete_seq();
      }
    }
  }
  float pmod() {
    if (mod_parts[0] == 1.f) {
      // reference quirk [FlamJam.h operator()]: the neutral early return
      // does NOT call handle_interval_end, so flam_counter and
      // fifth_flammament survive across intervals. A 2-row flam started
      // from a col-check break may have ms[0] up to group_tol (only
      // fresh starts are step_tol-bound), making mod_part() exactly 1.0;
      // mod_parts[0]==1 then skips the reset every interval, the counter
      // climbs to 4, fifth_flammament engages, and the mod latches at
      // neutral for the rest of the chart. Parity requires reproducing
      // this latch (observed: dupes corpus at rate 1.5, 7.6 MSD shift).
      return 1.f;
    }
    float p = 1.f;
    for (float mp : mod_parts) p += mp;
    p /= 5.f;
    p = Clamp(0.1f + p, 0.5f, 1.f);
    interval_end();
    return p;
  }
  void interval_end() {
    fifth_flammament = false;
    flam_counter = 0;
    mod_parts.fill(1.f);
  }
};

// ------------------------------------------------- TheThing1/2 (agnostic)

// [xx]a[yy]b[zz]-style jumptrillable sequences
// [Agnostic/HA_Sequencers/ThingSequencing.h, HA_PatternMods/TheThingFinder.h]
struct TheThingMod {
  bool variant2;  // thing2 detects [12]3[24]1[34]... (stricter start/steps)
  unsigned slip = 0;
  bool slippin = false;
  int slide = 0;
  int slip_counter = 0;
  std::array<float, 4> mod_parts{{1, 1, 1, 1}};
  static constexpr float kScaler = 0.2f;

  TheThingMod(bool v2) : variant2(v2) {}

  bool start_test(unsigned notes) const {
    if (variant2) return notes == 3 || notes == 12;
    return notes == 3 || notes == 7 || notes == 12 || notes == 14;
  }

  bool check(unsigned notes) const {
    if (!variant2) {
      switch (slide) {
        case 1:  // needs_single
          if (slip == 3 || slip == 7) return notes == 8;
          return notes == 1;
        case 2:  // needs_23_jump
          return notes == 6;
        case 3:  // needs_opposing_single
          if (slip == 3 || slip == 7) return notes == 1;
          return notes == 8;
        case 4:  // needs_opposing_ohjump
          if (slip == 3 || slip == 7) return notes == 12 || notes == 14;
          return notes == 3 || notes == 7;
        default:
          return false;
      }
    }
    switch (slide) {
      case 1:  // needs_single
        if (slip == 3) return notes == 4;
        return notes == 2;
      case 2:  // needs_door
        if (slip == 3) return notes == 10;
        return notes == 5;
      case 3:  // needs_blaap
        if (slip == 3) return notes == 1;
        return notes == 8;
      case 4:  // needs_opposing_ohjump
        if (slip == 3) return notes == 12;
        return notes == 3;
      default:
        return false;
    }
  }

  void start(unsigned notes) {
    slip = notes;
    slide = 1;
    slippin = true;
  }

  void advance(float /*ms_now*/, unsigned notes) {
    if (notes == 15u) {
      slippin = false;
      return;
    }
    if (!slippin) {
      if (start_test(notes)) start(notes);
      return;
    }
    if (check(notes)) {
      ++slide;
      if (slide == 5) {
        if (slip_counter < 4) mod_parts[slip_counter] = kScaler;
        ++slip_counter;
        start(notes);
      }
    } else {
      slippin = false;
    }
  }

  float pmod() {
    float p = (mod_parts[0] + mod_parts[1] + mod_parts[2] + mod_parts[3]) / 4.f;
    p = Clamp(0.05f + p, 0.15f, 1.f);
    slip_counter = 0;
    mod_parts.fill(1.f);
    return p;
  }
};

// -------------------------------------------------- hand-dependent sequencing

enum ColType { kColLeft, kColRight, kColOHJump, kColEmpty, kColInit };

// base/meta pattern types [Dependent/HD_BasicSequencing.h,
// HD_MetaSequencing.h]
enum BaseType {
  kBaseLeftRight, kBaseRightLeft, kBaseJumpSingle, kBaseSingleSingle,
  kBaseSingleJump, kBaseJumpJump, kNumBaseTypes, kBaseInit,
};
enum MetaType {
  kMetaCCCCCC, kMetaCCACC, kMetaACCA, kMetaCCSJJSCC, kMetaCCSJJSCCInv,
  kMetaEnigma, kMetaMetaEnigma, kMetaUnknowableEnigma, kNumMetaTypes,
  kMetaInit,
};

static inline bool IsCCTap(BaseType bt) {
  return bt == kBaseLeftRight || bt == kBaseRightLeft;
}

static BaseType DetermineBaseType(ColType now, ColType last) {
  if (last == kColInit) return kBaseInit;
  bool single = now == kColLeft || now == kColRight;
  if (last == kColOHJump) return single ? kBaseJumpSingle : kBaseJumpJump;
  if (!single) return kBaseSingleJump;
  if (now == kColLeft && last == kColRight) return kBaseRightLeft;
  if (now == kColRight && last == kColLeft) return kBaseLeftRight;
  return kBaseSingleSingle;
}

static MetaType DetermineMetaType(BaseType now, BaseType last,
                                  BaseType last_last, BaseType last_last_last,
                                  MetaType last_mt) {
  if (IsCCTap(now) && IsCCTap(last_last))
    return now == last_last ? kMetaCCCCCC : kMetaCCACC;
  if (now == kBaseSingleSingle && IsCCTap(last) &&
      last_last == kBaseSingleSingle)
    return kMetaACCA;
  if (IsCCTap(now)) {
    if (IsCCTap(last_last_last) && last == kBaseJumpSingle &&
        last_last == kBaseSingleJump)
      return now == last_last_last ? kMetaCCSJJSCC : kMetaCCSJJSCCInv;
  }
  if (last_mt == kMetaEnigma) return kMetaMetaEnigma;
  if (last_mt == kMetaMetaEnigma) return kMetaUnknowableEnigma;
  return kMetaEnigma;
}

// per-hand interval tap tracking [Dependent/IntervalHandInfo.h]
struct ItvHandInfo {
  std::array<int, 3> col_taps{{0, 0, 0}};
  std::array<MovingWindow<int>, 3> mw_col_taps;
  MovingWindow<int> mw_hand_taps;

  void set_col_taps(ColType ct) {
    if (ct == kColLeft || ct == kColRight) {
      ++col_taps[ct];
    } else {
      ++col_taps[kColLeft];
      ++col_taps[kColRight];
      col_taps[kColOHJump] += 2;
    }
  }
  void interval_end() {
    mw_hand_taps.push(col_taps[kColLeft] + col_taps[kColRight]);
    for (int c = 0; c < 3; ++c) mw_col_taps[c].push(col_taps[c]);
    col_taps.fill(0);
  }
  void zero() {
    col_taps.fill(0);
    for (auto& m : mw_col_taps) m.zero();
    mw_hand_taps.zero();
  }
  int taps_nowi() const { return mw_hand_taps.now(); }
  float taps_nowf() const { return static_cast<float>(taps_nowi()); }
  int taps_windowi(int w) const { return mw_hand_taps.total_of(w); }
  float taps_windowf(int w) const {
    return static_cast<float>(mw_hand_taps.total_of(w));
  }
  int col_taps_nowi(ColType ct) const { return mw_col_taps[ct].now(); }
  float col_taps_nowf(ColType ct) const {
    return static_cast<float>(col_taps_nowi(ct));
  }
  bool cols_equal_now() const {
    return col_taps_nowi(kColLeft) == col_taps_nowi(kColRight);
  }
  bool cols_equal_window(int w) const {
    return mw_col_taps[kColLeft].total_of(w) ==
           mw_col_taps[kColRight].total_of(w);
  }
  float col_prop_low_by_high() const {
    float a = col_taps_nowf(kColLeft), b = col_taps_nowf(kColRight);
    return std::min(a, b) / std::max(a, b);
  }
  float col_prop_low_by_high_window(int w) const {
    float a = static_cast<float>(mw_col_taps[kColLeft].total_of(w));
    float b = static_cast<float>(mw_col_taps[kColRight].total_of(w));
    return std::min(a, b) / std::max(a, b);
  }
};

// OHJ_Sequencer [Dependent/HD_Sequencers/OHJSequencing.h]
struct OHJSeq {
  int cur_seq_taps = 0;
  int max_seq_taps = 0;
  void zero() { cur_seq_taps = max_seq_taps = 0; }
  void complete_seq() {
    max_seq_taps = std::max(cur_seq_taps, max_seq_taps);
    cur_seq_taps = 0;
  }
  void advance(ColType ct, BaseType bt) {
    if (cur_seq_taps == 0) {
      if (ct != kColOHJump) return;
      cur_seq_taps += 2;
    }
    switch (bt) {
      case kBaseJumpJump: cur_seq_taps += 2; break;
      case kBaseJumpSingle: break;  // wait and see
      case kBaseLeftRight:
      case kBaseRightLeft:
        cur_seq_taps -= (cur_seq_taps == 2) ? 1 : 3;
        complete_seq();
        break;
      case kBaseSingleSingle:
      case kBaseSingleJump:
        complete_seq();
        break;
      default: break;
    }
  }
};

// OHJumpModGuyThing / CJOHJumpMod [Dependent/HD_PatternMods/OHJ.h, CJOHJ.h]
struct OHJumpMod {
  float min_mod, max_mod, max_seq_pool, max_seq_scaler, prop_pool;
  static constexpr float kMaxSeqWeight = 0.65f;
  OHJSeq ohj;

  OHJumpMod(bool cj)
      : min_mod(cj ? 0.65f : 0.75f), max_mod(1.f), max_seq_pool(1.2f),
        max_seq_scaler(cj ? 0.8f : 2.f), prop_pool(cj ? 1.4f : 1.5f) {}

  void full_reset() { ohj.zero(); }
  void advance(ColType ct, BaseType bt) { ohj.advance(ct, bt); }

  float operator()(const ItvHandInfo& itvhi, int cc_taps) {
    int max_seq = std::max(ohj.cur_seq_taps, ohj.max_seq_taps);
    float pmod = 1.f;
    auto max_seq_comp = [&](float base_seq_prop) {
      return std::sqrt(std::max(0.1f, max_seq_pool -
                                          base_seq_prop * max_seq_scaler));
    };
    auto prop_comp = [&](float base_jump_prop) {
      return std::sqrt(std::max(0.1f, prop_pool - base_jump_prop));
    };
    if (itvhi.taps_nowi() == 0 || itvhi.col_taps_nowi(kColOHJump) == 0) {
      pmod = 1.f;
    } else if (max_seq >= itvhi.taps_nowi()) {
      pmod = min_mod;
    } else if (max_seq < 3) {
      float jump_prop = itvhi.col_taps_nowf(kColOHJump) / itvhi.taps_nowf();
      pmod = Clamp(prop_comp(jump_prop), min_mod, max_mod);
    } else if (cc_taps == 0) {
      float seq_prop = static_cast<float>(max_seq) / itvhi.taps_nowf();
      pmod = Clamp(max_seq_comp(seq_prop), min_mod, max_mod);
    } else {
      float seq_prop = static_cast<float>(max_seq) / itvhi.taps_nowf();
      float msc = Clamp(max_seq_comp(seq_prop), 0.1f, max_mod);
      float jump_prop = itvhi.col_taps_nowf(kColOHJump) / itvhi.taps_nowf();
      float pc = Clamp(prop_comp(jump_prop), 0.1f, max_mod);
      pmod = (kMaxSeqWeight * msc + (1.f - kMaxSeqWeight) * pc);
      pmod = Clamp(pmod, min_mod, max_mod);
    }
    // interval end
    ohj.max_seq_taps = 0;
    return pmod;
  }
};

// BalanceMod [Dependent/HD_PatternMods/Balance.h]
static float BalanceMod(const ItvHandInfo& itvhi) {
  if (itvhi.taps_nowi() == 0) return 1.f;
  if (itvhi.cols_equal_now()) return 0.95f;
  if (itvhi.col_taps_nowi(kColLeft) == 0 ||
      itvhi.col_taps_nowi(kColRight) == 0)
    return 1.05f;
  float p = itvhi.col_prop_low_by_high();
  return Clamp(0.325f + (1.f + 1.f / p) / 4.f, 0.95f, 1.05f);
}

// WideRangeBalanceMod [Dependent/HD_PatternMods/WideRangeBalance.h]
static float WideRangeBalanceMod(const ItvHandInfo& itvhi) {
  const int window = 2;
  if (itvhi.taps_nowi() == 0) return 1.f;
  if (itvhi.cols_equal_window(window)) return 0.94f;
  float p = itvhi.col_prop_low_by_high_window(window);
  return Clamp(0.425f + (1.f + 1.f / p) / 4.f, 0.94f, 1.05f);
}

// OHTrillMod / VOHTrillMod [Dependent/HD_PatternMods/OHT.h, VOHT.h]
struct TrillMod {
  // voht=false: OHT params; voht=true: VOHT (vibro-trill) params
  bool voht;
  int window;
  float min_mod, max_mod, base, suppression, cv_threshold, min_len;

  bool luca_turilli = false;
  MovingWindow<float> badjuju;
  MovingWindow<int> mw_oht_taps;
  std::array<int, 4> foundyatrills{{0, 0, 0, 0}};
  int found_oht = 0, oht_len = 0, oht_taps = 0;
  float moving_cv = 1.f;

  TrillMod(bool v)
      : voht(v), window(v ? 2 : 3), min_mod(v ? 0.25f : 0.9f), max_mod(1.f),
        base(v ? 1.5f : 1.35f), suppression(v ? 0.2f : 0.4f),
        cv_threshold(v ? 0.25f : 0.5f), min_len(v ? 8.f : 0.f) {}

  void full_reset() {
    badjuju.zero();
    luca_turilli = false;
    found_oht = oht_len = oht_taps = 0;
    foundyatrills.fill(0);
    moving_cv = 1.f;
    // reference quirk [OHT.h full_reset]: _mw_oht_taps is NOT cleared on
    // the per-hand reset, so the right hand starts with the left hand's
    // trailing trill-taps window (can trip the no-trills/full-oht branches
    // for the first `window` intervals). Parity requires the same leak.
  }

  void complete_seq() {
    if (!luca_turilli || oht_len == 0) return;
    if (found_oht < 4) foundyatrills[found_oht] = oht_len;
    luca_turilli = false;
    oht_len = 0;
    ++found_oht;
    moving_cv = (moving_cv + 1.f) / 2.f;
  }

  void advance(MetaType mt, const MovingWindow<float>& ms_any) {
    switch (mt) {
      case kMetaCCCCCC: {
        moving_cv = (moving_cv + ms_any.cv_of(window)) / 2.f;
        if (moving_cv < cv_threshold) {
          if (luca_turilli) {
            ++oht_len;
            ++oht_taps;
          } else {
            luca_turilli = true;
            oht_len += 3;
            oht_taps += 3;
          }
        } else {
          complete_seq();
        }
      } break;
      case kMetaCCACC:
        break;  // wait and see
      default:
        complete_seq();
        break;
    }
  }

  float operator()(const ItvHandInfo& itvhi) {
    if (oht_len > 0 && found_oht < 4) {
      foundyatrills[found_oht] = oht_len;
      ++found_oht;
    }
    mw_oht_taps.push(oht_taps);

    float pmod;
    if (itvhi.taps_windowi(window) == 0 ||
        mw_oht_taps.total_of(window) == 0) {
      pmod = 1.f;
    } else if (voht && mw_oht_taps.total_of(window) < min_len) {
      pmod = 1.f;
    } else if (itvhi.taps_windowi(window) == mw_oht_taps.total_of(window)) {
      pmod = min_mod;
    } else {
      float goat = 0.f;
      if (found_oht != 0) {
        for (int v : foundyatrills) {
          if (v == 0) continue;
          goat = (static_cast<float>(v) / itvhi.taps_nowf()) - suppression;
        }
        goat = Clamp(goat, 0.1f, 1.f);
      }
      badjuju.push(goat);
      pmod = Clamp(base - badjuju.mean_of(window), min_mod, max_mod);
    }
    foundyatrills.fill(0);
    found_oht = oht_len = oht_taps = 0;
    return pmod;
  }
};

// ChaosMod [Dependent/HD_PatternMods/Chaos.h]
struct ChaosMod {
  MovingWindow<float> u, wot;
  void full_reset() {
    u.zero();
    wot.zero();
  }
  void advance(const MovingWindow<float>& ms_any) {
    float a = ms_any.now(), b = ms_any.last();
    if (a == 0.f || b == 0.f || a == b) {
      u.push(1.f);
      wot.push(u.mean_of(6));
      return;
    }
    float prop = std::max(a, b) / std::min(a, b);
    float flop = prop - static_cast<float>(static_cast<int>(prop));
    if (flop == 0.f) flop = 1.f;
    // NOTE: the reference writes `flop = abs(flop - 1.F) + 1.F` with the
    // *integer* abs() (Chaos.h:65 — no std::), which truncates the negative
    // fraction to 0, so any flop >= 0.5 collapses to exactly 1.0. Verified
    // against an instrumented reference build; preserve the quirk.
    else if (flop >= 0.5f) flop = 1.f;
    else flop += 1.f;
    u.push(flop);
    wot.push(u.mean_of(6));
  }
  float operator()(int total_taps) const {
    if (total_taps == 0) return 1.f;
    return Clamp(-0.075f + wot.mean_of(6), 0.95f, 1.045f);
  }
};

// WideRangeJumptrillMod [Dependent/HD_PatternMods/WideRangeJumptrill.h]
struct WRJTMod {
  static constexpr float kCvFactor = 3.f;
  static constexpr float kCvThreshold = 0.05f;
  const int window = 3;
  MovingWindow<int> mw_jt;
  int jt_counter = 0;
  bool for_real = false;
  bool last_passed = false;

  void full_reset() {
    mw_jt.zero();
    jt_counter = 0;
    for_real = false;
    last_passed = false;
  }
  void bibblybop(MetaType last_mt) {
    ++jt_counter;
    if (for_real) ++jt_counter;
    if ((last_mt == kMetaACCA || last_mt == kMetaCCACC ||
         last_mt == kMetaCCCCCC) && last_passed) {
      ++jt_counter;
      for_real = true;
    }
  }
  void advance(BaseType bt, MetaType mt, MetaType last_mt,
               MovingWindow<float>& ms_any) {
    if (bt == kBaseJumpJump || bt == kBaseSingleJump) return;
    switch (mt) {
      case kMetaCCCCCC:
        if ((last_passed = ms_any.roll_check(kCvFactor, kCvThreshold))) {
          bibblybop(last_mt);
          return;
        }
        break;
      case kMetaCCACC:
        if ((last_passed = ms_any.ccacc_check(kCvFactor, kCvThreshold))) {
          bibblybop(last_mt);
          return;
        }
        break;
      case kMetaACCA:
        if ((last_passed = ms_any.acca_check(kCvFactor, kCvThreshold))) {
          bibblybop(last_mt);
          return;
        }
        break;
      default:
        break;
    }
    for_real = false;
  }
  float operator()(const ItvHandInfo& itvhi) {
    mw_jt.push(jt_counter);
    jt_counter = 0;
    if (itvhi.taps_windowi(window) == 0 || mw_jt.total_of(window) == 0)
      return 1.f;
    if (mw_jt.total_of(window) < 20) return 1.f;
    float pmod = itvhi.taps_windowf(window) /
                 static_cast<float>(mw_jt.total_of(window)) * 0.75f;
    return Clamp(pmod, 0.25f, 1.f);
  }
};

// WideRangeRollMod [Dependent/HD_PatternMods/WideRangeRoll.h]
struct WRRMod {
  const int window = 5;
  MovingWindow<int> mw_max;
  MovingWindow<float> mw_adj_ms;
  bool last_passed = false;
  int run_len = 0;
  int max_thingy = 0;
  float hi_float = 0.f;
  std::array<float, 3> seq_ms{{0, 0, 0}};
  std::array<float, 4> idk_ms{{0, 0, 0, 0}};
  float moving_cv = 1.f;
  float pmod = 0.25f;

  void full_reset() {
    mw_max.zero();
    mw_adj_ms.zero();
    last_passed = false;
    run_len = max_thingy = 0;
    hi_float = 0.f;  // ref resets hi_im_a_float [WideRangeRoll.h:68]
    seq_ms.fill(0.f);
    idk_ms.fill(0.f);
    moving_cv = 1.f;
    pmod = 1.f;
  }

  bool do_timing_thing(float scaler) {
    mw_adj_ms.push(seq_ms[1]);
    if (mw_adj_ms.cv_of(window) > 0.3f) return false;
    hi_float = CvOf3(seq_ms[0], seq_ms[1], seq_ms[2]);
    if (hi_float < 0.12f) {
      moving_cv = (hi_float + moving_cv + hi_float) / 3.f;
      return true;
    }
    moving_cv = (hi_float + moving_cv) / 2.f;
    return moving_cv < 0.35f / scaler;
  }
  bool do_other_timing_thing(float scaler) {
    mw_adj_ms.push(idk_ms[1]);
    mw_adj_ms.push(idk_ms[2]);
    if (mw_adj_ms.cv_of(window) > 0.3f) return false;
    hi_float = CvOf4(idk_ms[0], idk_ms[1], idk_ms[2], idk_ms[3]);
    if (hi_float < 0.12f) {
      moving_cv = (hi_float + moving_cv + hi_float) / 3.f;
      return true;
    }
    moving_cv = (hi_float + moving_cv) / 2.f;
    return moving_cv < 0.35f / scaler;
  }

  void complete_seq() {
    if (run_len > 0) max_thingy = std::max(run_len, max_thingy);
    run_len = 0;
  }
  void bibblybop(MetaType last_mt) {
    if (last_mt == kMetaEnigma)
      moving_cv = (moving_cv + hi_float) / 2.f;
    else if (last_mt == kMetaMetaEnigma)
      moving_cv = (moving_cv + hi_float + hi_float) / 3.f;
    if (!last_passed) {
      complete_seq();
      return;
    }
    ++run_len;
    if (last_mt == kMetaEnigma) ++run_len;
    if (last_mt == kMetaMetaEnigma) run_len += 2;
  }

  void advance(BaseType bt, MetaType mt, MetaType last_mt, float any_ms,
               float tc_ms) {
    seq_ms[0] = seq_ms[1];
    seq_ms[1] = seq_ms[2];
    seq_ms[2] = (bt == kBaseSingleSingle) ? tc_ms : any_ms;
    if (bt == kBaseSingleJump || bt == kBaseJumpSingle) return;
    if (bt == kBaseJumpJump) {
      if (run_len > 0) bibblybop(last_mt);
      return;
    }
    switch (mt) {
      case kMetaACCA:
        complete_seq();
        break;
      case kMetaCCCCCC:
        if (seq_ms[1] > seq_ms[0]) {
          seq_ms[1] /= 2.5f;
          last_passed = do_timing_thing(1.f);
          seq_ms[1] *= 2.5f;
        } else {
          seq_ms[0] /= 2.5f;
          seq_ms[2] /= 2.5f;
          last_passed = do_timing_thing(1.f);
          seq_ms[0] *= 2.5f;
          seq_ms[2] *= 2.5f;
        }
        bibblybop(last_mt);
        break;
      case kMetaCCACC:
        seq_ms[1] /= 2.5f;
        last_passed = do_timing_thing(1.25f);
        seq_ms[1] *= 2.5f;
        bibblybop(last_mt);
        break;
      case kMetaCCSJJSCC:
      case kMetaCCSJJSCCInv:
        idk_ms[2] = seq_ms[0];
        idk_ms[1] = seq_ms[1];
        idk_ms[0] = seq_ms[2];
        idk_ms[3] = any_ms;
        // reference quirk [WideRangeRoll.h handle_ccsjjscc_timing_check]:
        // do_other_timing_thing's return is DISCARDED — last_passed_check
        // keeps its stale value from the previous zoop/woop pattern; the
        // calls still mutate mw_adj_ms/moving_cv state, and the early
        // return between them keys off the stale flag. Parity requires
        // the same stale-flag behavior (observed: tech corpus rate 0.5,
        // 1.3 MSD stamina shift via argmax flip).
        idk_ms[1] /= 2.5f;
        idk_ms[2] /= 2.5f;
        do_other_timing_thing(1.25f);
        idk_ms[1] *= 2.5f;
        idk_ms[2] *= 2.5f;
        if (!last_passed) {
          idk_ms[1] /= 3.f;
          idk_ms[2] /= 3.f;
          do_other_timing_thing(1.25f);
          idk_ms[1] *= 3.f;
          idk_ms[2] *= 3.f;
        }
        bibblybop(last_mt);
        break;
      case kMetaInit:
      case kMetaEnigma:
        break;  // wait and see
      default:
        complete_seq();
        break;
    }
  }

  float operator()(const ItvHandInfo& itvhi) {
    max_thingy = std::max(run_len, max_thingy);
    mw_max.push(max_thingy);
    max_thingy = 0;
    if (itvhi.taps_nowi() == 0 || itvhi.taps_windowi(window) == 0 ||
        mw_max.total_of(window) == 0) {
      pmod = 1.f;
      return pmod;
    }
    float zomg = itvhi.taps_windowf(window) /
                 static_cast<float>(mw_max.total_of(window));
    pmod *= zomg;
    pmod = Clamp(0.15f + std::sqrt(pmod), 0.25f, 1.f);
    return pmod;
  }
};

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
enum AnchStatus { kAnchInit, kAnchReset, kAnchoring };

struct AnchorSeq {
  int len = 1;
  float sc_ms = kMsInit;
  float max_ms = kMsInit;
  float len_cap_ms = kMsInit;
  float last = kSInit;
  float start = kSInit;
  AnchStatus status = kAnchInit;

  void reset() {
    len = 1;
    sc_ms = max_ms = len_cap_ms = kMsInit;
    last = start = kSInit;
    status = kAnchInit;
  }

  void advance(float now) {
    // no first-note special case: the reference runs the too-slow/too-fast
    // checks from the very first tap (sc_ms is huge vs ms_init, so the
    // first note lands in reset_too_slow with len=2, start=s_init)
    // [GenericSequencing.h Anchor_Sequencing::operator()]
    sc_ms = MsFrom(now, last);
    if (sc_ms > max_ms + 10.f || sc_ms * 2.34f < max_ms) {
      start = last;
      len = 2;
      status = kAnchReset;
    } else {
      ++len;
      status = kAnchoring;
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
  // max anchor length per col per interval (for WideRangeAnchor)
  std::array<int, 2> max_seen{{0, 0}};
  std::array<MovingWindow<int>, 2> mw_max;

  void reset() {
    anch[0].reset();
    anch[1].reset();
    mw_any_ms.fill(kMsInit);
    mw_cc_ms.fill(kMsInit);
    mw_sc_ms[0].fill(kMsInit);
    mw_sc_ms[1].fill(kMsInit);
    max_seen.fill(0);
    mw_max[0].zero();
    mw_max[1].zero();
  }

  void interval_end() {
    for (int c = 0; c < 2; ++c) {
      mw_max[c].push(max_seen[c]);
      max_seen[c] = 0;
    }
  }

  void advance(ColType ct, float row_time, float any_ms) {
    if (ct == kColLeft || ct == kColRight) {
      anch[ct].advance(row_time);
      max_seen[ct] = std::max(max_seen[ct], anch[ct].len);
      mw_sc_ms[ct].push(anch[ct].sc_ms);
      // cc from the other column's last
      mw_cc_ms.push(MsFrom(row_time, anch[ct == kColLeft ? 1 : 0].last));
    } else if (ct == kColOHJump) {
      anch[0].advance(row_time);
      anch[1].advance(row_time);
      max_seen[0] = std::max(max_seen[0], anch[0].len);
      max_seen[1] = std::max(max_seen[1], anch[1].len);
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

// RunningMan sequencing + mod [Dependent/HD_Sequencers/RMSequencing.h,
// HD_PatternMods/RunningMan.h]
enum RMB { kRmbOffTapOH, kRmbOffTapSH, kRmbAnchor, kRmbJack, kRmbInit };

struct RMSeq {
  ColType ct = kColInit;
  bool running = false;
  RMB rmb = kRmbInit, last_rmb = kRmbInit;
  // RunningMan counters
  int ran_taps = 0, len = 0, off_taps = 0, off_len = 0, off_taps_sh = 0;
  int oht_taps = 0, oht_len = 0, ot_sh_len = 0, jack_taps = 0, jack_len = 0;
  int anch_len = 0;
  bool is_bursting = false, had_burst = false;
  float last_anchor_time = kSInit, start = kSInit;

  // limits [RunningMan.h params]
  static constexpr int kMaxOht = 2, kMaxOff = 3, kMaxOtSh = 2, kMaxBurst = 6,
                       kMaxJack = 3, kMaxAnch = 5;

  void full_reset() {
    running = false;
    rmb = last_rmb = kRmbInit;
    start = last_anchor_time = kSInit;
    is_bursting = had_burst = false;
    // reference quirk [RMSequencing.h RunningMan::full_reset]: ran_taps
    // and ot_sh_len are NOT cleared ("minus _len, ran_taps, and time" —
    // and ot_sh_len is simply missing from the list), so both leak across
    // hand resets and rm resets. Parity requires the same leak.
    len = off_taps = off_len = off_taps_sh = 0;
    oht_taps = oht_len = jack_taps = jack_len = anch_len = 0;
  }

  void restart(const AnchorSeq& as) {
    start = as.last - as.sc_ms / 1000.f;
    last_anchor_time = as.last;
    len = 2;
    ran_taps = 2;
    is_bursting = had_burst = false;
    off_taps_sh = off_taps = off_len = 0;
    oht_taps = oht_len = jack_taps = jack_len = anch_len = 0;
    // retroactively apply the same-hand off tap that allowed the restart
    ++off_taps_sh;
    ++ot_sh_len;
    ++off_len;
    ++off_taps;
    ++ran_taps;
  }

  bool off_len_exceeds_max() {
    if (off_len <= kMaxOff) return false;
    if (had_burst || off_len > kMaxBurst) return true;
    is_bursting = true;
    return false;
  }

  void end_off_tap_run() {
    if (is_bursting) {
      is_bursting = false;
      had_burst = true;
    }
    off_len = 0;
    ot_sh_len = 0;
  }

  void advance_off_hand() {
    // rmb_off_tap_oh behavior
    ++off_len;
    ++off_taps;
    ++ran_taps;
    if (off_len_exceeds_max()) running = false;
    else jack_len = 0;
    last_rmb = kRmbOffTapOH;
  }

  void advance(ColType now_ct, BaseType bt, MetaType mt,
               const AnchorSeq& as) {
    if (mt == kMetaCCCCCC && now_ct != ct) {
      if (oht_len == 0) {
        ++oht_len;
        ++oht_taps;
      }
      ++oht_len;
      ++oht_taps;
      if (oht_len > kMaxOht) running = false;
    }
    last_anchor_time = as.last;

    switch (bt) {
      case kBaseLeftRight:
      case kBaseRightLeft:
      case kBaseSingleSingle:
        rmb = (ct == now_ct) ? kRmbAnchor : kRmbOffTapSH;
        break;
      case kBaseJumpSingle:
        if (last_rmb == kRmbOffTapOH)
          rmb = (ct == now_ct) ? kRmbAnchor : kRmbOffTapSH;
        else
          rmb = kRmbJack;
        break;
      case kBaseSingleJump:
      case kBaseJumpJump:
        rmb = (last_rmb == kRmbOffTapOH) ? kRmbAnchor : kRmbJack;
        break;
      default:
        return;  // init: bail without updating last_rmb
    }

    if (!running) {
      if (rmb == kRmbAnchor && last_rmb == kRmbOffTapSH) {
        running = true;
        restart(as);
      }
    } else {
      switch (rmb) {
        case kRmbOffTapSH:
          ++off_taps_sh;
          ++ot_sh_len;
          ++off_len;
          ++off_taps;
          ++ran_taps;
          if (off_len_exceeds_max() || ot_sh_len > kMaxOtSh) {
            running = false;
          } else {
            anch_len = 0;
            jack_len = 0;
          }
          break;
        case kRmbAnchor:
          if (anch_len > kMaxAnch) {
            running = false;
            break;
          }
          if (as.status == kAnchReset) {
            if (last_rmb == kRmbOffTapSH) restart(as);
            else running = false;
          } else if (as.status == kAnchoring) {
            ++len;
            ++anch_len;
            ++ran_taps;
            off_len = 0;
            ot_sh_len = 0;
          }
          break;
        case kRmbJack:
          ++jack_len;
          ++jack_taps;
          ++ran_taps;
          if (jack_len > kMaxJack) running = false;
          else end_off_tap_run();
          break;
        default:
          break;
      }
    }
    last_rmb = rmb;
  }

  float offhand_tap_prop() const {
    if (off_taps - off_taps_sh <= 0) return 0.f;
    return static_cast<float>(off_taps - off_taps_sh) /
           static_cast<float>(len);
  }
  float off_tap_same_prop() const {
    if (off_taps_sh == 0) return 0.f;
    return static_cast<float>(off_taps_sh) / static_cast<float>(len);
  }

  float difficulty() const {
    // rma_diff_scaler = 1.52 * basescalers[tech] [RMSequencing.h:5]
    if (!running || len < 3) return 1.f;
    float total_ms = MsFrom(last_anchor_time, start);
    float pule = total_ms / static_cast<float>(len - 1);
    return MsToScaledNps(pule) * 1.52f * kBaseScalers[kTechnical];
  }
};

struct RunningManMod {
  std::array<RMSeq, 2> rms;
  RMSeq highest;

  void full_reset() {
    rms[0].full_reset();
    rms[1].full_reset();
    rms[0].ct = kColLeft;
    rms[1].ct = kColRight;
    highest.full_reset();
  }

  void advance_off_hand() {
    rms[0].advance_off_hand();
    rms[1].advance_off_hand();
  }

  void advance(ColType ct, BaseType bt, MetaType mt, const Sequencer& seq) {
    rms[0].advance(ct, bt, mt, seq.anch[0]);
    rms[1].advance(ct, bt, mt, seq.anch[1]);
    if (rms[0].running && rms[1].running)
      highest = rms[0].difficulty() > rms[1].difficulty() ? rms[0] : rms[1];
    else
      highest = rms[0].running ? rms[0] : rms[1];
  }

  float highest_anchor_difficulty() const {
    float oht_p = Clamp(1.5f - highest.offhand_tap_prop(), 0.75f, 1.f);
    return highest.difficulty() * oht_p;
  }

  float operator()(int total_taps) {
    float pmod = 1.f;
    if (total_taps == 0) {
      pmod = 1.f;
    } else if (highest.len < 5 || highest.ran_taps < 1 ||
               highest.off_taps_sh < 1) {
      pmod = 1.f;  // min_mod
    } else {
      float offhand = Clamp(1.7f - highest.offhand_tap_prop(), 0.f, 1.f);
      float same = Clamp(0.8f + highest.off_tap_same_prop(), 0.f, 1.25f);
      float anchor_len_comp = Clamp(highest.len / 5.f, 0.f, 1.25f);
      float jack_bonus = highest.jack_taps >= 1 ? 0.1f : 0.f;
      float oht_bonus = highest.oht_taps >= 1 ? 0.1f : 0.f;
      float p = 0.5f + anchor_len_comp + jack_bonus + oht_bonus;
      pmod = Clamp(std::sqrt(p * same * offhand), 1.f, 1.1f);
    }
    highest.full_reset();
    return pmod;
  }
};

// WideRangeAnchorMod [Dependent/HD_PatternMods/WideRangeAnchor.h]
static float WideRangeAnchorMod(const ItvHandInfo& itvhi,
                                const Sequencer& seq) {
  const int window = 2;
  int a = seq.mw_max[0].max_of(window);
  int b = seq.mw_max[1].max_of(window);
  int diff = std::abs(a - b);
  if (a == 0 && b == 0) return 1.f;
  if (a == 0 || b == 0) return 1.05f;
  if (diff <= 4) return 1.f;
  if (diff > 8) return 1.05f;
  // formula result is clamped to [min_mod, max_mod]; at diff == diff_max the
  // unclamped value is 1.1 but the reference clamps to 1.05 [WideRangeAnchor.h]
  return Clamp(1.f + 0.1f * ((static_cast<float>(diff) - 4.f) / 4.f), 1.f,
               1.05f);
}

// techyo [SequencedBaseDiffCalc.h]
struct TechBase {
  std::array<float, kMaxRowsPerInterval> tc_static{};
  int row_counter = 0;
  MovingWindow<float> teehee;
  float rm_itv_max_diff = 0.f;  // runningman anchor diff [techyo]

  void reset() {
    row_counter = 0;
    teehee.fill(0.f);
    rm_itv_max_diff = 0.f;
  }

  void advance_rm_comp(float rm_diff) {
    rm_itv_max_diff = std::max(rm_itv_max_diff, rm_diff);
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
    // tc base is 0 for an interval with no rows on this hand [techyo
    // get_tc_base], and still enters the 4:9 weighted average with nps
    float tc = 0.f;
    if (row_counter > 0) {
      float total = 0.f;
      for (int i = 0; i < row_counter; ++i) total += tc_static[i];
      tc = MsToScaledNps(total / static_cast<float>(row_counter));
    }
    float tc_part = (4.f * tc + 5.f * nps_base) / 9.f;  // weighted_average 4:9
    // merge with the runningman anchor difficulty [techyo get_itv_diff]
    return std::max(tc_part, rm_itv_max_diff);
  }

  void interval_end() {
    row_counter = 0;
    rm_itv_max_diff = 0.f;
  }
};

// ----------------------------------------------------------- main pipeline

static void RunPatternMods(Calc& c) {
  // agnostic loop [Ulbu.h run_agnostic_pmod_loop]
  MetaItvInfo mitvi;
  MetaRowInfo mri;
  JSModState js;
  HSModState hs;
  FlamJam fj;
  TheThingMod tt(false), tt2(true);
  for (int h = 0; h < kNumHands; ++h)
    for (int p = 0; p < kNumPMods; ++p)
      c.doot[h][p].assign(c.numitv, 1.f);

  for (int itv = 0; itv < c.numitv; ++itv) {
    for (int row = 0; row < c.itv_size[itv]; ++row) {
      const RowInfo& ri = c.rows[itv][row];
      mri.advance(mitvi, ri.time, ri.count, ri.notes);
      fj.advance(mri.ms_now, ri.notes);
      tt.advance(mri.ms_now, ri.notes);
      tt2.advance(mri.ms_now, ri.notes);
    }
    c.doot[kLeft][kPmStream][itv] = StreamMod(mitvi);
    c.doot[kLeft][kPmJS][itv] = js(mitvi);
    c.doot[kLeft][kPmHS][itv] = hs(mitvi);
    c.doot[kLeft][kPmCJ][itv] = CJMod(mitvi);
    c.doot[kLeft][kPmCJDensity][itv] = CJDensityMod(mitvi);
    c.doot[kLeft][kPmFlamJam][itv] = fj.pmod();
    c.doot[kLeft][kPmTheThing][itv] = tt.pmod();
    c.doot[kLeft][kPmTheThing2][itv] = tt2.pmod();
    mitvi.interval_end();
  }
  for (int p : {kPmStream, kPmJS, kPmHS, kPmCJ, kPmCJDensity, kPmFlamJam,
                kPmTheThing, kPmTheThing2})
    Smooth(c.doot[kLeft][p], 1.f, c.numitv);
  for (int p : {kPmStream, kPmJS, kPmHS, kPmCJ, kPmCJDensity, kPmFlamJam,
                kPmTheThing, kPmTheThing2})
    c.doot[kRight][p] = c.doot[kLeft][p];

  // dependent loop [Ulbu.h run_dependent_pmod_loop]
  static const std::array<unsigned, kNumHands> hand_ids = {3u, 12u};
  // mod/sequencer state is constructed ONCE and full_reset per hand,
  // matching the reference's member-object lifecycle [Ulbu.h:261-281
  // full_hand_reset]. This matters because several reference full_resets
  // intentionally leak state into the right hand (OHT/VOHT _mw_oht_taps,
  // RunningMan ran_taps/ot_sh_len) — fresh per-hand objects would diverge.
  OHJumpMod ohj(false), cjohj(true);
  TrillMod oht(false), voht(true);
  ChaosMod chaos;
  WRJTMod wrjt;
  WRRMod wrr;
  RunningManMod rm;
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

    // hand-dependent mod state [Ulbu.h full_hand_reset]
    ItvHandInfo itvhi;
    itvhi.zero();
    ohj.full_reset();
    cjohj.full_reset();
    chaos.full_reset();
    wrjt.full_reset();
    wrr.full_reset();
    oht.full_reset();
    voht.full_reset();
    rm.full_reset();

    // metaHandInfo chain [Dependent/MetaHandInfo.h]
    ColType last_ct = kColInit;
    BaseType bt = kBaseInit, last_bt = kBaseInit, last_last_bt = kBaseInit,
             lll_bt = kBaseInit;
    MetaType mt = kMetaInit, last_mt = kMetaInit;

    float last_row_time = kSInit;
    for (int itv = 0; itv < c.numitv; ++itv) {
      for (int row = 0; row < c.itv_size[itv]; ++row) {
        const RowInfo& ri = c.rows[itv][row];
        ColType ct = DetermineColType(ri.notes, hand_ids[h]);
        if (ct == kColEmpty) {
          // runningman tracks off-hand taps even on empty rows for this
          // hand [Ulbu.h:370-376]
          rm.advance_off_hand();
          if (ri.count == 2) rm.advance_off_hand();
          continue;
        }
        float any_ms = MsFrom(ri.time, last_row_time);
        seq.advance(ct, ri.time, any_ms);

        // advance pattern chain
        lll_bt = last_last_bt;
        last_last_bt = last_bt;
        last_bt = bt;
        bt = DetermineBaseType(ct, last_ct);
        last_mt = mt;
        mt = DetermineMetaType(bt, last_bt, last_last_bt, lll_bt, last_mt);
        last_ct = ct;

        itvhi.set_col_taps(ct);

        // mod sequencing [Ulbu.h handle_row_dependent_pattern_advancement]
        ohj.advance(ct, bt);
        cjohj.advance(ct, bt);
        oht.advance(mt, seq.mw_any_ms);
        voht.advance(mt, seq.mw_any_ms);
        wrr.advance(bt, mt, last_mt, seq.mw_any_ms.now(), seq.sc_ms_now(ct));
        wrjt.advance(bt, mt, last_mt, seq.mw_any_ms);
        chaos.advance(seq.mw_any_ms);
        rm.advance(ct, bt, mt, seq);

        tech.advance(seq, ct);
        tech.advance_rm_comp(rm.highest_anchor_difficulty());
        // jack difficulty per row [Ulbu.h update_sequenced_base_diffs]
        c.jack_diff[h].push_back(
            {ri.time,
             MsToScaledNps(seq.lowest_anchor_ms()) * kBaseScalers[kJackSpeed]});

        last_row_time = ri.time;
      }
      // interval end [Ulbu.h handle_dependent_interval_end]
      itvhi.interval_end();
      seq.interval_end();

      // NOTE: the reference zeroes _base_types in _mitvhi.interval_end()
      // BEFORE set_dependent_pmods runs (Ulbu.h:287-293,
      // MetaIntervalHandInfo.h:12), so OHJ/CJOHJ always read cc_taps == 0
      // and their weighted-average branch is dead code. Preserve that.
      const int cc_taps = 0;
      c.doot[h][kPmOHJump][itv] = ohj(itvhi, cc_taps);
      c.doot[h][kPmCJOHJump][itv] = cjohj(itvhi, cc_taps);
      c.doot[h][kPmOHTrill][itv] = oht(itvhi);
      c.doot[h][kPmVOHTrill][itv] = voht(itvhi);
      c.doot[h][kPmBalance][itv] = BalanceMod(itvhi);
      c.doot[h][kPmChaos][itv] = chaos(itvhi.taps_nowi());
      c.doot[h][kPmWideRangeBalance][itv] = WideRangeBalanceMod(itvhi);
      c.doot[h][kPmWideRangeRoll][itv] = wrr(itvhi);
      c.doot[h][kPmWideRangeJumptrill][itv] = wrjt(itvhi);
      c.doot[h][kPmWideRangeAnchor][itv] = WideRangeAnchorMod(itvhi, seq);
      c.doot[h][kPmRanMan][itv] = rm(itvhi.taps_nowi());

      c.tech_base[h][itv] = tech.itv_diff(c.nps_base[h][itv]);
      tech.interval_end();
    }
    // dependent smoothing pass [UlbuAcolytes.h run_dependent_smoothing_pass]
    // NOTE: the reference smooths BOTH hands' arrays at the end of EACH
    // hand's loop (Ulbu.h run_dependent_pmod_loop calls
    // run_dependent_smoothing_pass inside the hand loop, and that pass
    // iterates `for (auto& h : calc.doot)`) — so the left hand is smoothed
    // twice and the right hand once. Preserve that behavior exactly.
    for (int p : {kPmOHJump, kPmBalance, kPmRoll, kPmOHTrill, kPmVOHTrill,
                  kPmChaos, kPmWideRangeBalance, kPmWideRangeRoll,
                  kPmWideRangeJumptrill, kPmWideRangeAnchor, kPmRanMan,
                  kPmCJOHJump})
      for (int hh = 0; hh < kNumHands; ++hh)
        Smooth(c.doot[hh][p], 1.f, c.numitv);
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
                  std::max(FastPow(c.doot[h][kPmCJ][i], 2.f), 1.f) /
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
      gotpoints -= (pts - pts * FastPow(x / v[i], 1.7f));
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

static PyObject* VecToList(const std::vector<float>& v, int n) {
  PyObject* l = PyList_New(n);
  for (int i = 0; i < n; ++i)
    PyList_SetItem(l, i, PyFloat_FromDouble(i < (int)v.size() ? v[i] : 0.f));
  return l;
}

// calc_debug(rate, notes[, goal]) -> dict of per-interval internals.
// Mirrors the reference Calc's doot/soap/base_adj_diff storage so parity
// tooling (scripts/minacalc_parity.py --debug) can diff interval-by-interval.
static PyObject* method_calc_debug(PyObject*, PyObject* args) {
  float rate = 0.f, score_goal = mina::kDefaultScoreGoal;
  PyObject* note_buff = nullptr;
  if (!PyArg_ParseTuple(args, "fO|f", &rate, &note_buff, &score_goal))
    return nullptr;
  Py_ssize_t size = PyList_Size(note_buff);
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
  if (current_notes != 0)
    rows.push_back({current_notes, current_time / 1000.f});

  std::vector<float> zeros(mina::kNumSkillsets, 0.f);
  mina::Calc c;
  std::vector<float> ssr = zeros;
  bool skip = rows.size() <= 1 || mina::WalkRows(rows, rate, c);
  if (!skip) {
    mina::RunPatternMods(c);
    mina::InitAdjDiff(c);
    ssr = mina::CalcSkillSets(rows, rate, score_goal);
  }

  PyObject* out = PyDict_New();
  // PyDict_SetItemString does NOT steal references: drop ours after insert
  auto set_and_release = [&out](const char* key, PyObject* v) {
    PyDict_SetItemString(out, key, v);
    Py_DECREF(v);
  };
  PyObject* pssr = PyList_New(ssr.size());
  for (size_t i = 0; i < ssr.size(); ++i)
    PyList_SetItem(pssr, i, PyFloat_FromDouble(ssr[i]));
  set_and_release("ssr", pssr);
  set_and_release("numitv", PyLong_FromLong(skip ? 0 : c.numitv));
  int n = skip ? 0 : c.numitv;
  PyObject* doot = PyList_New(2);
  PyObject* soap = PyList_New(2);
  PyObject* badj = PyList_New(2);
  PyObject* itvpts = PyList_New(2);
  PyObject* jackd = PyList_New(2);
  for (int h = 0; h < 2; ++h) {
    PyObject* dl = PyList_New(mina::kNumPMods);
    for (int m = 0; m < mina::kNumPMods; ++m)
      PyList_SetItem(dl, m, VecToList(c.doot[h][m], n));
    PyList_SetItem(doot, h, dl);
    // soap layout mirrors ref CalcDiffValue order: NPSBase, TechBase
    PyObject* sl = PyList_New(2);
    PyList_SetItem(sl, 0, VecToList(c.nps_base[h], n));
    PyList_SetItem(sl, 1, VecToList(c.tech_base[h], n));
    PyList_SetItem(soap, h, sl);
    PyObject* bl = PyList_New(mina::kNumSkillsets);
    for (int m = 0; m < mina::kNumSkillsets; ++m)
      PyList_SetItem(bl, m, VecToList(c.base_adj_diff[h][m], n));
    PyList_SetItem(badj, h, bl);
    PyObject* pl = PyList_New(n);
    for (int i = 0; i < n; ++i)
      PyList_SetItem(pl, i, PyLong_FromLong(c.itv_points[h][i]));
    PyList_SetItem(itvpts, h, pl);
    PyObject* jl = PyList_New(c.jack_diff[h].size());
    for (size_t i = 0; i < c.jack_diff[h].size(); ++i) {
      // PyTuple_Pack does not steal its arguments either
      PyObject* a = PyFloat_FromDouble(c.jack_diff[h][i].first);
      PyObject* b = PyFloat_FromDouble(c.jack_diff[h][i].second);
      PyObject* t = PyTuple_Pack(2, a, b);
      Py_DECREF(a);
      Py_DECREF(b);
      PyList_SetItem(jl, i, t);
    }
    PyList_SetItem(jackd, h, jl);
  }
  set_and_release("doot", doot);
  set_and_release("soap", soap);
  set_and_release("base_adj_diff", badj);
  set_and_release("itv_points", itvpts);
  set_and_release("jack_diff", jackd);
  return out;
}

static PyMethodDef MinaCalcMethods[] = {
    {"version", method_version, METH_VARARGS, "MinaCalc version"},
    {"calc_skill_set", method_calc_skill_set, METH_VARARGS,
     "Calculate the 8 MSD skillset ratings for a 4K note list"},
    {"calc_debug", method_calc_debug, METH_VARARGS,
     "Return per-interval internals (pattern mods, base diffs) for debugging"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef minacalc_module = {
    PyModuleDef_HEAD_INIT, "minacalc",
    "Native MSD difficulty calculator (Etterna algorithm, reimplemented)",
    -1, MinaCalcMethods};

PyMODINIT_FUNC PyInit_minacalc(void) {
  return PyModule_Create(&minacalc_module);
}
