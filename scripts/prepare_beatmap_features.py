"""Dataset prep: build the sqlite feature.db used for prompt conditioning
(ref: /root/reference/scripts/prepare_beatmap_features.py).

Per chart in beatmap.txt: star rating via osu-tools (dotnet subprocess,
optional — skipped when --osu_tools is not given), LN ratio / map type,
ranked status from a crawled "set_id status" list, and the 8 MinaCalc MSD
skillset scores (requires the native minacalc extension:
`make -C native/minacalc`).

Usage: python scripts/prepare_beatmap_features.py -b data/beatmap_4k/beatmap.txt \
    -f configs/mug/mania_beatmap_features.yaml [--osu_tools .../PerformanceCalculator.dll]
"""

from __future__ import annotations

import argparse
import json
import os
import sqlite3
import subprocess
import sys
import traceback

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mug_diffusion_tpu.data.convertor import parse_osu_file

ETT_KEYS = [
    "overall", "stream", "jumpstream", "handstream", "stamina",
    "jackspeed", "chordjack", "technical",
]


def invoke_osu_tools(beatmap_path, osu_tools, dotnet_path="dotnet"):
    """Official osu! star rating via the osu-tools difficulty calculator
    (ref: prepare_beatmap_features.py:48-55)."""
    cmd = [dotnet_path, osu_tools, "difficulty", beatmap_path, "-j"]
    result = json.loads(subprocess.check_output(cmd))
    return result["results"][0]["attributes"]["star_rating"]


def create_table(conn, table_name, columns, primary_keys=None):
    if primary_keys is not None:
        columns = columns + ["PRIMARY KEY (%s)" % ", ".join(primary_keys)]
    conn.execute(
        "CREATE TABLE IF NOT EXISTS `%s` (%s)" % (table_name, ", ".join(columns))
    )


def ensure_column(conn, table_name, name, db_type, default):
    columns = [d[0] for d in conn.execute(f"SELECT * FROM {table_name}").description]
    if name not in columns:
        if default is not None:
            conn.execute(
                "ALTER TABLE %s ADD COLUMN %s %s DEFAULT `%s`"
                % (table_name, name, db_type, default)
            )
        else:
            conn.execute(
                "ALTER TABLE %s ADD COLUMN %s %s" % (table_name, name, db_type)
            )


def insert_or_replace(conn, table_name, contents):
    if not contents:
        return
    columns = list(contents[0].keys())
    sql = "INSERT OR REPLACE INTO `%s` (%s) VALUES (%s)" % (
        table_name, ", ".join(columns), ", ".join(["?"] * len(columns))
    )
    conn.executemany(
        sql, [[m[c] for c in columns] for m in contents]
    )


def get_notes(ob):
    notes = []
    for line in ob:
        if line.strip() == "":
            continue
        try:
            params = line.split(",")
            start = int(float(params[2]))
            column = int(int(float(params[0])) / int(512 / 4))
            assert column <= 3
            notes.append((start, column))
        except Exception:
            pass
    notes.sort(key=lambda x: x[0])
    return notes


def get_ett_scores(ob, update_dict):
    """MinaCalc relabel (ref: prepare_beatmap_features.py:106-160)."""
    if update_dict.get("ett", 0) != 0:
        return False
    import minacalc

    result = dict(zip(ETT_KEYS, minacalc.calc_skill_set(1.0, get_notes(ob))))
    patterns = {k: v for k, v in result.items()
                if k not in ("overall", "stamina")}
    max_score = max(patterns.values())
    update_dict.update({"ett": result["overall"]})
    for k in ETT_KEYS[1:]:
        update_dict[f"{k}_ett"] = result[k]
        update_dict[k] = int(max_score - result[k] <= 1)
    return True


def get_ln_ratio(ob, update_dict):
    """ref: prepare_beatmap_features.py:162-192."""
    if update_dict.get("ln_ratio") is not None:
        return False
    ln = rc = 0
    for line in ob:
        params = line.split(",")
        if int(params[3]) == 128:
            ln += 1
        else:
            rc += 1
    if ln == 0 and rc == 0:
        return False
    ln_ratio = ln / (ln + rc)
    update_dict.update({
        "ln_ratio": ln_ratio,
        "rc": int(ln_ratio < 0.1),
        "ln": int(ln_ratio >= 0.4),
        "hb": int(0.1 <= ln_ratio <= 0.7),
    })
    return True


def prepare_features(beatmap_txt, features_yaml, osu_tools=None,
                     ranked_map_path=None, dotnet_path="dotnet"):
    with open(features_yaml) as f:
        schema = yaml.safe_load(f)
    ranked_maps = {}
    if ranked_map_path is not None:
        with open(ranked_map_path) as f:
            for line in f:
                set_id, status = line.strip().split(" ")
                ranked_maps[int(set_id)] = status

    conn = sqlite3.connect(
        os.path.join(os.path.dirname(beatmap_txt), "feature.db")
    )
    type_map = {"numeric": "REAL", "category": "TEXT", "bool": "INT"}
    default_map = {"numeric": "0.0", "category": "NULL", "bool": "-1"}
    create_table(conn, "Feature", ["name TEXT", "set_name TEXT"],
                 ["name", "set_name"])
    for x in schema:
        ensure_column(conn, "Feature", x["name"].split(",")[-1].strip(),
                      type_map[x["type"]], default_map[x["type"]])

    n_done = 0
    with open(beatmap_txt, encoding="utf8") as f:
        lines = [line.strip() for line in f if line.strip()]
    for path in lines:
        name = os.path.basename(path)
        set_name = os.path.basename(os.path.dirname(path))
        update_dict = {"name": name, "set_name": set_name}
        update = False
        try:
            cursor = conn.execute(
                "SELECT * FROM Feature WHERE name = ? AND set_name = ?",
                [name, set_name],
            )
            columns = [d[0] for d in cursor.description]
            row = cursor.fetchone()
            if row is not None:
                update_dict.update(dict(zip(columns, row)))

            ob, meta = parse_osu_file(path, None)

            if update_dict.get("sr") is None:
                if osu_tools is not None:
                    update_dict["sr"] = invoke_osu_tools(
                        path, osu_tools, dotnet_path
                    )
                    update = True
            if update_dict.get("rank_status") in (None, "NULL"):
                update_dict["rank_status"] = ranked_maps.get(
                    meta.set_id, "graveyard"
                )
                update = True
            update = get_ln_ratio(ob, update_dict) or update
            update = get_ett_scores(ob, update_dict) or update
        except Exception:
            traceback.print_exc()
            continue

        if update:
            insert_or_replace(conn, "Feature", [update_dict])
            conn.commit()
            n_done += 1
    print(f"Updated {n_done}/{len(lines)} charts in feature.db")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--beatmap_txt", "-b", type=str, required=True)
    parser.add_argument("--features_yaml", "-f", type=str,
                        default="configs/mug/mania_beatmap_features.yaml")
    parser.add_argument("--osu_tools", type=str, default=None)
    parser.add_argument("--ranked_map_path", type=str, default=None)
    parser.add_argument("--dotnet_path", type=str, default="dotnet")
    opt, _ = parser.parse_known_args()
    prepare_features(opt.beatmap_txt, opt.features_yaml, opt.osu_tools,
                     opt.ranked_map_path, opt.dotnet_path)
