"""Symbolic post-processing: BPM/offset detection, grid snapping, and
mini-jack removal.

Pure NumPy, CPU-side (not on the TPU hot path). Numerics-parity port of
ref: mug/data/utils.py (timing :46, gridify :110,
remove_intractable_mania_mini_jacks :142). The least-squares BPM refinement
replaces sklearn's LinearRegression with an explicit weighted-normal-equation
solve producing identical results.
"""

from __future__ import annotations

import numpy as np

EPSILON = 10  # ms tolerance for grid alignment


def parse_hit_objects(line, column_width):
    """(start_ms, column, end_ms|None) from an osu hit-object line
    (ref: mug/data/utils.py:7-13)."""
    if line is None:
        return None, None, None
    params = line.split(",")
    column = int(int(float(params[0])) / column_width)
    start_time = float(params[2])
    end = None if int(params[3]) != 128 else float(params[5].split(":")[0])
    return start_time, column, end


def _weighted_linregress(x: np.ndarray, y: np.ndarray, w: np.ndarray):
    """Weighted least squares fit y = a*x + b. Returns (a, b).

    Matches sklearn LinearRegression(fit_intercept=True).fit(x, y,
    sample_weight=w) used at ref: mug/data/utils.py:29-34.
    """
    sw = np.sum(w)
    if sw <= 0:
        return np.nan, np.nan
    mx = np.sum(w * x) / sw
    my = np.sum(w * y) / sw
    varx = np.sum(w * (x - mx) ** 2)
    if varx == 0:
        return np.nan, np.nan
    a = np.sum(w * (x - mx) * (y - my)) / varx
    b = my - a * mx
    return a, b


def test_timing(time_list, test_bpm, test_offset, div, refine):
    """Score how well (bpm, offset) explains the note times
    (ref: mug/data/utils.py:16-43)."""
    cur_offset = test_offset
    cur_bpm = test_bpm

    gap = 60 * 1000 / (test_bpm * div)
    delta_time_list = time_list - test_offset
    meter_list = delta_time_list / gap
    meter_list_round = np.round(meter_list)
    timing_error = np.abs(meter_list - meter_list_round)
    valid = (timing_error < EPSILON / gap).astype(np.int32)
    valid_count = np.sum(valid)

    if valid_count >= 2 and refine:
        coef, intercept = _weighted_linregress(
            meter_list_round.astype(np.float64),
            time_list.astype(np.float64),
            valid.astype(np.float64),
        )
        if not np.isinf(coef) and not np.isnan(coef) and coef != 0:
            cur_offset = intercept
            cur_bpm = 60000 / coef / 4

            while cur_bpm < 150:
                cur_bpm = cur_bpm * 2
            while cur_bpm >= 300:
                cur_bpm = cur_bpm / 2

    valid_ratio = valid_count / test_bpm
    return valid_ratio, valid, cur_bpm, cur_offset


def timing(time_list, verbose=False):
    """Grid-search BPM in [150, 300) x offsets, with LSQ refinement
    (ref: mug/data/utils.py:46-103)."""
    offset = time_list[0]

    best_bpm = None
    best_offset = None
    best_valid_ratio = -1

    for test_bpm in np.arange(150, 300, 0.1):
        valid_ratio, valid, cur_bpm, cur_offset = test_timing(
            time_list, test_bpm, offset, div=1, refine=False
        )

        if valid_ratio > best_valid_ratio:
            valid_ratio, valid, cur_bpm, cur_offset = test_timing(
                time_list, test_bpm, offset, div=1, refine=True
            )
            best_valid_ratio = valid_ratio
            best_bpm = cur_bpm
            best_offset = cur_offset
            if verbose:
                print(
                    f"[valid: {valid_ratio} / {len(valid)}] bpm {test_bpm} -> "
                    f"{cur_bpm}, offset {offset} -> {cur_offset}"
                )

        # refine the offset at the current bpm
        gap = 60000 / cur_bpm
        for test_offset in np.arange(best_offset, best_offset - gap, -gap / 4):
            valid_ratio, valid, cur_bpm, cur_offset = test_timing(
                time_list, cur_bpm, test_offset, div=1, refine=False
            )
            if valid_ratio > best_valid_ratio:
                valid_ratio, valid, cur_bpm, cur_offset = test_timing(
                    time_list, cur_bpm, test_offset, div=1, refine=True
                )
                best_valid_ratio = valid_ratio
                best_bpm = cur_bpm
                best_offset = cur_offset

    _, _, best_bpm, best_offset = test_timing(
        time_list, best_bpm, best_offset, div=16, refine=False
    )
    _, _, best_bpm, best_offset = test_timing(
        time_list, best_bpm, best_offset, div=6, refine=False
    )

    return best_bpm, best_offset


def gridify(hit_objects, verbose=False):
    """Snap note times to the detected BPM grid over divisors 1..32
    (ref: mug/data/utils.py:110-139)."""
    key_count = 4
    column_width = int(512 / key_count)
    times = []
    for line in hit_objects:
        st, _, _ = parse_hit_objects(line, column_width)
        times.append(st)
    times = np.asarray(times, dtype=np.float32)
    bpm, offset = timing(times, verbose)

    def format_time(t):
        for div in [1, 2, 4, 3, 6, 8, 16, 32]:
            gap = 60 * 1000 / (bpm * div)
            meter = (t - offset) / gap
            meter_round = round(meter)
            timing_error = abs(meter - meter_round)
            if timing_error < EPSILON / gap:
                return str(int(meter_round * gap + offset))
        return str(int(t))

    new_hit_objects = []
    for line in hit_objects:
        elements = line.split(",")
        elements[2] = format_time(int(elements[2]))
        if int(elements[3]) == 128:
            e = elements[5].split(":")
            e[0] = format_time(int(e[0]))
            elements[5] = ":".join(e)
        new_hit_objects.append(",".join(elements))
    return new_hit_objects, bpm, offset


def gridify_potassium(hit_objects, fraction: int = 4, verbose: bool = False):
    """Alternative BPM/offset fitter (ref: scripts/mapping.py:53-165):
    merges sub-10ms note clusters, grid-searches BPM by variance of grid
    residuals at 1/``fraction`` lines, then refines the offset with a
    coarse-to-fine scan weighted by beat-line importance. Returns
    (bpm, offset)."""
    time_list = [int(line.split(",")[2]) for line in hit_objects]
    if len(time_list) == 0:
        return None
    start_time = time_list[0]

    # merge clusters of notes closer than 10 ms into (mean_time, count)
    epsilon = 10
    times = list(time_list) + [2_000_000_000]
    cluster_starts = [0]
    for idx in range(1, len(times)):
        if times[idx] - times[cluster_starts[-1]] < epsilon:
            continue
        cluster_starts.append(idx)
    der_list = []
    for i in range(len(cluster_starts) - 1):
        seg = times[cluster_starts[i]:cluster_starts[i + 1]]
        der_list.append((sum(seg) / len(seg), len(seg)))

    avg = np.asarray([d[0] for d in der_list], np.float64)
    cnt = np.asarray([d[1] for d in der_list], np.float64)

    def get_bpm(precision, offset):
        best_bpm, best_loss = -1, 1e18
        for bpm_i in range(150 * precision, 300 * precision):
            bpm = bpm_i / precision
            gap = 60 * 1000 / (fraction * bpm)
            gap_time = avg - offset
            delta = gap_time - gap * np.round(gap_time / gap)
            s = float(np.sum(delta * cnt))
            s2 = float(np.sum(delta * delta * cnt))
            notes = float(np.sum(cnt))
            loss = (s2 - 2 * s * (s / notes) + (s * s / notes / notes)) / notes
            loss /= gap
            if loss < best_loss:
                best_bpm, best_loss = bpm, loss
        if verbose:
            print("potassium bpm loss:", best_loss)
        return best_bpm

    def get_offset(bpm, offset):
        if fraction == 12:
            weights = [100, 0, 20, 50, 60, 0, 100, 0, 60, 50, 20, 0]
        elif fraction == 4:
            weights = [100, 100, 100, 100]
        else:
            raise ValueError(f"unsupported fraction {fraction}")
        weights = np.asarray(weights, np.float64)
        gap = 60 * 1000 / (fraction * bpm)

        def score(off):
            shang = np.round((avg - off) / gap).astype(np.int64)
            return float(np.sum(weights[shang % fraction] * cnt))

        for precision_range in [range(-300, 300, 30), range(-30, 30, 5),
                                range(-5, 5, 1)]:
            best_off, best_val = offset, score(offset)
            for i in precision_range:
                val = score(offset + i)
                if val > best_val:
                    best_val, best_off = val, offset + i
            offset = best_off

        # final least-squares nudge onto the grid
        gap_time = avg - offset
        delta = gap_time - gap * np.round(gap_time / gap)
        offset += float(np.sum(delta * cnt) / np.sum(cnt))
        return offset

    offset = float(start_time)
    bpm = get_bpm(10, offset)
    offset = get_offset(bpm, offset)
    return bpm, offset


def remove_intractable_mania_mini_jacks(
    hit_objects, verbose=False, jack_interval=90
):
    """Remove or relocate same-column notes closer than ``jack_interval`` ms
    (ref: mug/data/utils.py:142-273).

    Heuristic pipeline per detected jack: (1) keep if it ends a stream;
    (2) try moving the latter-then-previous note to a jack-free column
    (same-hand column first), skipping LNs and columns covered by an LN;
    (3) otherwise delete whichever note sits in the bigger chord.
    """
    key_count = 4
    column_width = int(512 / key_count)
    new_hit_objects = [x for x in hit_objects]

    def has_ln(start_index, column, time):
        i = start_index - 1
        while i >= 0:
            start_time, c, end_time = parse_hit_objects(
                new_hit_objects[i], column_width
            )
            i -= 1
            if end_time is None or start_time is None:
                continue
            if c == column and start_time <= time:
                return end_time >= time - 50
        return False

    def get_notes_idx_in_interval(
        start_index, time, interval, column, search_previous, search_latter
    ):
        result = []
        if search_previous:
            i = start_index - 1
            while i >= 0:
                st, c, _ = parse_hit_objects(new_hit_objects[i], column_width)
                if st is not None:
                    if abs(st - time) <= interval:
                        if c == column or column < 0:
                            result.append((i, st, c))
                    else:
                        break
                i -= 1
        if search_latter:
            i = start_index + 1
            while i < len(new_hit_objects):
                st, c, _ = parse_hit_objects(new_hit_objects[i], column_width)
                if st is not None:
                    if abs(st - time) <= interval:
                        if c == column or column < 0:
                            result.append((i, st, c))
                    else:
                        break
                i += 1
        return result

    for i in range(len(new_hit_objects)):
        start_time, column, end_time = parse_hit_objects(
            new_hit_objects[i], column_width
        )

        previous_jacks = get_notes_idx_in_interval(
            i, start_time, jack_interval, column,
            search_previous=True, search_latter=False,
        )
        if len(previous_jacks) == 0:
            continue

        # Step 1: if nothing follows within 2x the interval, it's the end
        # of a stream — leave it alone.
        notes_after_it = get_notes_idx_in_interval(
            i, start_time, jack_interval * 2, -1,
            search_previous=False, search_latter=True,
        )
        count_notes_after_it = sum(
            1 for n in notes_after_it if abs(n[1] - start_time) >= EPSILON
        )
        if count_notes_after_it == 0:
            if verbose:
                print(f"Ignore: {start_time}, {column}")
            continue

        # Step 2: try to move a note to another column.
        success = False
        for (is_ln, try_move_index, try_move_t, try_move_src_column) in [
            (end_time is not None, i, start_time, column),
            (False,) + previous_jacks[0],
        ]:
            if is_ln:
                continue  # moving LNs is intractable
            if try_move_src_column in (0, 1):
                try_move_dst_columns = (1 - try_move_src_column, 2, 3)
            else:
                try_move_dst_columns = (5 - try_move_src_column, 1, 0)

            for try_move_dst_column in try_move_dst_columns:
                if has_ln(try_move_index, try_move_dst_column, try_move_t):
                    continue
                jacks_after_move = len(
                    get_notes_idx_in_interval(
                        try_move_index, try_move_t, jack_interval,
                        try_move_dst_column,
                        search_previous=True, search_latter=True,
                    )
                )
                if jacks_after_move == 0:
                    success = True
                    if verbose:
                        print(
                            f"Move: {try_move_t}, {try_move_src_column} -> "
                            f"{try_move_dst_column}"
                        )
                    elements = new_hit_objects[try_move_index].split(",")
                    elements[0] = str(
                        int(round((try_move_dst_column + 0.5) * column_width))
                    )
                    new_hit_objects[try_move_index] = ",".join(elements)
                    break
            if success:
                break
        if success:
            continue

        # Step 3: remove the note belonging to the bigger chord.
        holds_latter = len(
            get_notes_idx_in_interval(
                i, start_time, 10, -1, search_previous=True, search_latter=True
            )
        ) + 1
        holds_previous = len(
            get_notes_idx_in_interval(
                previous_jacks[0][0], previous_jacks[0][1], 10, -1,
                search_previous=True, search_latter=True,
            )
        ) + 1
        if holds_latter > 1 and holds_latter >= holds_previous and end_time is None:
            new_hit_objects[i] = None
        elif holds_previous > 1 and holds_previous >= holds_latter:
            new_hit_objects[previous_jacks[0][0]] = None
        elif end_time is not None:  # current is an LN: remove the previous
            new_hit_objects[previous_jacks[0][0]] = None
        else:
            new_hit_objects[i] = None

    return [x for x in new_hit_objects if x is not None]
