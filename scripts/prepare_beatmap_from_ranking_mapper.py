"""Dataset prep: crawl the graveyard/unranked sets of mappers who have ranked
4K maps, to harvest high-quality unranked training data
(ref: /root/reference/scripts/prepare_beatmap_from_ranking_mapper.py).

Requires osu! OAuth credentials (see prepare_ranked_beatmap.py).

Usage: python scripts/prepare_beatmap_from_ranking_mapper.py \
    --ranked data/ranked.txt -o data/mapper_sets.txt -m 3
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.prepare_ranked_beatmap import request_auth_api


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ranked", type=str, required=True,
                        help="'set_id status' list from prepare_ranked_beatmap")
    parser.add_argument("--output_path", "-o", type=str, required=True)
    parser.add_argument("--mode_num", "-m", type=int, default=3)
    opt, _ = parser.parse_known_args()

    # collect the mapper ids of ranked sets
    ranked_ids = []
    with open(opt.ranked) as f:
        for line in f:
            set_id, status = line.strip().split(" ")
            if status in ("ranked", "approved", "qualified", "loved"):
                ranked_ids.append(int(set_id))

    mapper_ids = set()
    for set_id in ranked_ids:
        data = request_auth_api(f"beatmapsets/{set_id}", "GET", params={})
        uid = data.get("user_id")
        if uid:
            mapper_ids.add(uid)
    print(f"{len(mapper_ids)} ranked mappers")

    seen = set()
    for uid in mapper_ids:
        for map_type in ("graveyard", "pending", "loved", "ranked"):
            offset = 0
            while True:
                sets = request_auth_api(
                    f"users/{uid}/beatmapsets/{map_type}", "GET",
                    params={"limit": 50, "offset": offset},
                )
                if not sets:
                    break
                for s in sets:
                    set_id = int(s["id"])
                    if set_id in seen:
                        continue
                    seen.add(set_id)
                    with open(opt.output_path, "a+") as f:
                        f.write(f"{set_id} {s['status']}\n")
                if len(sets) < 50:
                    break
                offset += 50
    print(f"wrote {len(seen)} sets to {opt.output_path}")


if __name__ == "__main__":
    main()
