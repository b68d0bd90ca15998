#!/usr/bin/env python
"""Interleaved A/B of the fused shuffle's two row layouts — int64 dict
term ids (default when the vocab fits DICT_VOCAB_MAX) vs term strings
(forced via SPARK_GRAFT_DICT_VOCAB_MAX=1) — at ONE parallelism level,
same input, fresh process per build, min-of-trials per mode. Same
discipline as fused_ab.py: cross-window comparisons are invalid on this
host (wall noise +-2-3x), so the modes alternate inside one window.

    SPARK_GRAFT_AB_CORES=8 SPARK_GRAFT_AB_TRIALS=3 python bench/dict_ab.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODES = {"dict": None, "string": "1"}  # value -> SPARK_GRAFT_DICT_VOCAB_MAX


def main() -> None:
    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from fused_ab import run_one

        print(
            "RESULT "
            + json.dumps(
                run_one(int(sys.argv[2]), int(os.environ["_AB_CONVS"]), True)
            )
        )
        return

    cores = int(os.environ.get("SPARK_GRAFT_AB_CORES", "8"))
    trials = int(os.environ.get("SPARK_GRAFT_AB_TRIALS", "3"))
    n_convs = int(os.environ.get("SPARK_GRAFT_AB_CONVS", "100000"))
    best: dict[str, dict] = {}
    seen: dict[str, list] = {m: [] for m in MODES}
    for trial in range(trials):
        order = list(MODES) if trial % 2 == 0 else list(reversed(MODES))
        for mode in order:
            env = dict(os.environ, _AB_CONVS=str(n_convs), PYTHONPATH=REPO)
            cap = MODES[mode]
            if cap is None:
                env.pop("SPARK_GRAFT_DICT_VOCAB_MAX", None)
            else:
                env["SPARK_GRAFT_DICT_VOCAB_MAX"] = cap
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--one",
                    str(cores),
                ],
                capture_output=True,
                text=True,
                env=env,
            )
            line = [
                ln
                for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")
            ]
            if not line:
                sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
                raise SystemExit(f"{mode} failed")
            res = json.loads(line[-1][7:])
            res["mode"] = mode
            seen[mode].append(res["build_s"])
            if mode not in best or res["build_s"] < best[mode]["build_s"]:
                best[mode] = res
            print(
                f"trial {trial} {mode}: {res['build_s']} s", file=sys.stderr
            )
    print(
        json.dumps(
            {
                "cores": cores,
                "n_convs": n_convs,
                "all_walls": seen,
                "best": best,
                "string_over_dict": round(
                    best["string"]["build_s"] / best["dict"]["build_s"], 3
                ),
                "loadavg": list(os.getloadavg()),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
