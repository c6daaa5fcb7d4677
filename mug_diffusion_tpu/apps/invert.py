"""Chart -> prompt inversion ("chart2prompt", ref: webui.py:196-274).

Parses a .osu chart, computes LN ratio / map type, and (when the native
MinaCalc module is built) the 8 Etterna MSD skillset scores with
more/less dominant-pattern flags.
"""

from __future__ import annotations

from typing import List, Tuple

from mug_diffusion_tpu.data.convertor import parse_osu_file

ETT_KEYS = [
    "overall", "stream", "jumpstream", "handstream", "stamina",
    "jackspeed", "chordjack", "technical",
]


def chart_to_prompt(chart_path: str, rate: float = 1.0) -> List[Tuple[str, object]]:
    """ref: webui.py:196-274 startInvertion."""
    if rate is None or rate <= 0:
        raise ValueError("Rate must > 0")

    hit_objects, _ = parse_osu_file(chart_path, None)
    notes = []
    ln = 0
    rc = 0
    for line in hit_objects:
        if line.strip() == "":
            continue
        try:
            params = line.split(",")
            if int(params[3]) == 128:
                ln += 1
            else:
                rc += 1
            start = int(float(params[2]))
            column = int(int(float(params[0])) / int(512 / 4))
            assert column <= 3
            notes.append((start, column))
        except Exception:
            pass

    if ln + rc == 0:
        raise ValueError("Chart has no notes")
    ln_ratio = ln / (ln + rc)
    if ln_ratio < 0.1:
        map_type = "Rice (LN < 10%)"
    elif ln_ratio <= 0.4:
        map_type = "Hybrid (10% < LN < 40%)"
    else:
        map_type = "Long Note (LN > 40%)"

    result = [("map type", map_type), ("ln ratio", ln_ratio)]

    try:
        import minacalc
    except ImportError:
        result.append(("MSD score (Etterna)",
                       "unavailable: build native/minacalc first"))
        return result

    notes.sort(key=lambda x: x[0])
    scores = dict(zip(ETT_KEYS, minacalc.calc_skill_set(rate, notes)))
    patterns = {k: v for k, v in scores.items()
                if k not in ("overall", "stamina")}
    max_score = max(patterns.values())

    result.insert(0, ("MSD score (Etterna)", scores["overall"]))
    for k in ("chordjack", "stamina", "stream", "jumpstream", "handstream",
              "jackspeed", "technical"):
        result.append(
            (k, "more" if (max_score - scores[k] <= 1) else "less")
        )
        result.append((f"{k} MSD", scores[k]))
    return result
