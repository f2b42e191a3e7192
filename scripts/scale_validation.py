"""Run the 500k-row derived-knob validation and persist its numbers.

VERDICT r7 #4: the strongest tests in the repo (tests/test_scale_knobs.py,
SPARK_GRAFT_SLOW-gated) ran only in judge/builder sessions and left no
artifact. This runner executes them, scrapes their printed summaries, and
appends ONE dated JSON line to SCALE_RUNS.jsonl at the repo root — the
durable record SCALE.md §Derived-knob validation cites, re-checkable by
diffing lines round over round.

Usage:  python scripts/scale_validation.py          # ~3 min at local[32]
"""
from __future__ import annotations

import datetime
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import cpu_calibration_sec  # noqa: E402

LSH_RE = re.compile(
    r"\[scale-knobs\] emb LSH @(?P<n_large>\d+): knobs=\((?P<bands>\d+),(?P<bits>\d+)\) "
    r"recall=(?P<recall>[\d.]+) wall=(?P<wall>[\d.]+)s \| "
    r"@(?P<n_small>\d+): knobs=\((?P<bands_s>\d+),(?P<bits_s>\d+)\) "
    r"recall=(?P<recall_s>[\d.]+) wall=(?P<wall_s>[\d.]+)s \| "
    r"ratio=(?P<ratio>[\d.]+)x \(linear-model (?P<linear>[\d.]+)x.*\| "
    r"bucket mean=(?P<bucket_mean>[\d.]+) max=(?P<bucket_max>\d+) "
    r"target=(?P<target>\d+)"
)
MH_RE = re.compile(
    r"\[scale-knobs\] minhash LSH @(?P<n>\d+) docs: pairs=(?P<pairs>\d+) "
    r"recall=(?P<recall>[\d.]+) extras=(?P<extras>\d+) wall=(?P<wall>[\d.]+)s"
)
SUB_RE = re.compile(
    r"\[scale-knobs\] substring spans @(?P<n>\d+) docs: "
    r"flagged=(?P<flagged>\d+) planted=(?P<planted>\d+) "
    r"missed=(?P<missed>\d+) extras=(?P<extras>\d+) wall=(?P<wall>[\d.]+)s "
    r"\| @(?P<n_small>\d+): wall=(?P<wall_s>[\d.]+)s \| ratio=(?P<ratio>[\d.]+)x"
)
DECON_RE = re.compile(
    r"\[scale-knobs\] emb decon @(?P<n_corpus>\d+) corpus x (?P<n_bench>\d+) "
    r"bench: knobs=\((?P<bands>\d+),(?P<bits>\d+)\) flagged=(?P<flagged>\d+) "
    r"recall=(?P<recall>[\d.]+) extras=(?P<extras>\d+) wall=(?P<wall>[\d.]+)s"
)
DEDUP_RE = re.compile(
    r"\[scale-knobs\] emb dedup @(?P<n>\d+): clusters=(?P<clusters>\d+) "
    r"collapsed=(?P<collapsed>\d+) missed=(?P<missed>\d+) "
    r"extras=(?P<extras>\d+) wall=(?P<wall>[\d.]+)s"
)
SRV_RE = re.compile(
    r"\[scale-serving\] router==replica @(?P<n>\d+) skewed rows: "
    r"queries=(?P<queries>\d+) mismatches=(?P<mismatches>\d+) "
    r"pool_mismatches=(?P<pool_mismatches>\d+) "
    r"split_cells=(?P<split_cells>\d+) hot_slices=(?P<hot_slices>\d+) "
    r"hot_slice_max=(?P<hot_slice_max>\d+) of hot_total=(?P<hot_total>\d+) "
    r"reshard=(?P<reshard>[\d.]+)s"
)


def main() -> int:
    calib_pre = cpu_calibration_sec()
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_scale_knobs.py",
            "tests/test_scale_serving.py",
            "-s",
            "-q",
        ],
        cwd=REPO,
        env={**__import__("os").environ, "SPARK_GRAFT_SLOW": "1"},
        capture_output=True,
        text=True,
    )
    calib_post = cpu_calibration_sec()
    out = proc.stdout
    sys.stdout.write(out)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        return proc.returncode

    record: dict = {
        "date": datetime.date.today().isoformat(),
        "calib": {"pre": calib_pre, "post": calib_post},
        "pytest": "tests/test_scale_knobs.py + tests/test_scale_serving.py "
        "(SPARK_GRAFT_SLOW=1)",
    }
    m = LSH_RE.search(out)
    if m:
        g = m.groupdict()
        record["emb_lsh"] = {
            k: (float(v) if "." in v else int(v)) for k, v in g.items()
        }
    m = MH_RE.search(out)
    if m:
        g = m.groupdict()
        record["minhash"] = {
            k: (float(v) if "." in v else int(v)) for k, v in g.items()
        }
    m = SUB_RE.search(out)
    if m:
        g = m.groupdict()
        record["substring"] = {
            k: (float(v) if "." in v else int(v)) for k, v in g.items()
        }
    m = DECON_RE.search(out)
    if m:
        g = m.groupdict()
        record["emb_decon"] = {
            k: (float(v) if "." in v else int(v)) for k, v in g.items()
        }
    m = DEDUP_RE.search(out)
    if m:
        g = m.groupdict()
        record["emb_dedup"] = {
            k: (float(v) if "." in v else int(v)) for k, v in g.items()
        }
    m = SRV_RE.search(out)
    if m:
        g = m.groupdict()
        record["serving_1m"] = {
            k: (float(v) if "." in v else int(v)) for k, v in g.items()
        }
    if any(
        k not in record
        for k in (
            "emb_lsh",
            "minhash",
            "substring",
            "emb_decon",
            "emb_dedup",
            "serving_1m",
        )
    ):
        sys.stderr.write(
            "scale_validation: pytest passed but the printed summaries did "
            "not match the expected format — NOT writing a partial artifact "
            "(fix the regexes or the test prints first)\n"
        )
        return 2
    with open(REPO / "SCALE_RUNS.jsonl", "a") as fh:
        fh.write(json.dumps(record, separators=(",", ":")) + "\n")
    print(f"appended SCALE_RUNS.jsonl: {json.dumps(record)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
