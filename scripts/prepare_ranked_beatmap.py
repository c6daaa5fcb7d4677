"""Dataset prep: crawl osu! API v2 for ranked beatmapset statuses, emitting
"set_id status" lines consumed by prepare_beatmap_features.py
(ref: /root/reference/scripts/prepare_ranked_beatmap.py).

Requires network access and osu! OAuth credentials (supply your own
client_id/client_secret via env OSU_CLIENT_ID / OSU_CLIENT_SECRET or the
interactive flow).

Usage: python scripts/prepare_ranked_beatmap.py -o data/ranked.txt -m 3
"""

from __future__ import annotations

import argparse
import json
import os
import time

REQUEST_MIN_INTERVAL = 1
_session = None
_recent_request_time = 0.0


def request_api(api, method, end_point="https://osu.ppy.sh/api/v2/",
                params=None, header=None, retry_count=0):
    import requests

    global _session, _recent_request_time
    params = params or {}
    header = header or {}
    if _session is None:
        _session = requests.Session()

    interval = time.time() - _recent_request_time
    if interval < REQUEST_MIN_INTERVAL:
        time.sleep(REQUEST_MIN_INTERVAL - interval)
    _recent_request_time = time.time()

    url = end_point + api
    try:
        if method.lower() == "get":
            return _session.get(url, params=params, timeout=60,
                                headers=header).json()
        return _session.post(url, data=params, timeout=60,
                             headers=header).json()
    except Exception:
        if retry_count >= 5:
            raise
        _session = None
        time.sleep(10 + retry_count * 30)
        return request_api(api, method, end_point, params, header,
                           retry_count + 1)


def auth(params, save_name):
    creds = {
        "client_id": int(os.environ.get("OSU_CLIENT_ID", "0")),
        "client_secret": os.environ.get("OSU_CLIENT_SECRET", ""),
        "redirect_uri": os.environ.get("OSU_REDIRECT_URI", ""),
        "scope": "public",
    }
    assert creds["client_id"] and creds["client_secret"], (
        "set OSU_CLIENT_ID / OSU_CLIENT_SECRET (register an OAuth app at "
        "https://osu.ppy.sh/home/account/edit)"
    )
    params.update(creds)
    auth_data = request_api("token", "post",
                            end_point="https://osu.ppy.sh/oauth/",
                            params=params)
    auth_data["expire_time"] = time.time() + auth_data["expires_in"] - 3600
    with open(save_name, "w") as f:
        json.dump(auth_data, f)
    return auth_data


def get_access_token():
    auth_data = {}
    cache = "auth.json"
    if os.path.exists(cache):
        with open(cache) as f:
            auth_data = json.load(f)
    if time.time() >= auth_data.get("expire_time", 0):
        refresh_token = auth_data.get("refresh_token")
        if refresh_token is None:
            # client-credentials grant (public scope)
            auth_data = auth({"grant_type": "client_credentials"}, cache)
        else:
            auth_data = auth(
                {"grant_type": "refresh_token", "refresh_token": refresh_token},
                cache,
            )
    return auth_data["token_type"] + " " + auth_data["access_token"]


def request_auth_api(api, method, params):
    return request_api(api, method, params=params,
                       header={"Authorization": get_access_token()})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_path", "-o", type=str, required=True)
    parser.add_argument("--mode_num", "-m", type=int, default=3)
    opt, _ = parser.parse_known_args()

    songs = set()
    state = {"m": int(opt.mode_num)}
    total = None
    seen = 0
    while True:
        data = request_auth_api("beatmapsets/search/", method="GET",
                                params=state)
        if total is None:
            total = data["total"]
        seen += len(data["beatmapsets"])
        print(f"{seen}/{total}")
        for beatset in data["beatmapsets"]:
            set_id = int(beatset["id"])
            if set_id not in songs:
                songs.add(set_id)
                with open(opt.output_path, "a+") as f:
                    f.write(f"{set_id} {beatset['status']}\n")
        if data.get("cursor_string"):
            state["cursor_string"] = data["cursor_string"]
        else:
            break


if __name__ == "__main__":
    main()
