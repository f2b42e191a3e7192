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
LSH_1M_RE = re.compile(
    r"\[scale-knobs\] emb LSH 1M probe @(?P<n>\d+): "
    r"knobs=\((?P<bands>\d+),(?P<bits>\d+)\) "
    r"recall=(?P<recall>[\d.]+) wall=(?P<wall>[\d.]+)s \| "
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


_SECTIONS = {
    "emb_lsh": LSH_RE,
    # standing 1M probe (r15, VERDICT r14 #7 — was a one-off in r14): the
    # direct evidence the bucket-group kernel scales past the 500k tier
    "emb_lsh_1m": LSH_1M_RE,
    "minhash": MH_RE,
    "substring": SUB_RE,
    "emb_decon": DECON_RE,
    "emb_dedup": DEDUP_RE,
    "serving_1m": SRV_RE,
}
_WALLED = ("emb_lsh", "emb_lsh_1m", "minhash", "substring", "emb_decon",
           "emb_dedup")


def _run_once() -> tuple[dict, float, int]:
    """One bracketed pytest run -> (parsed sections, calib mean, rc)."""
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
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        return {}, 0.0, proc.returncode
    sections: dict = {"calib": {"pre": calib_pre, "post": calib_post}}
    for name, rx in _SECTIONS.items():
        m = rx.search(proc.stdout)
        if m:
            sections[name] = {
                k: (float(v) if "." in v else int(v))
                for k, v in m.groupdict().items()
            }
    # The 1M probe's scaling ratio vs the 500k section, against the
    # n x bands linear model — same-run walls, so host capacity cancels.
    # Stored as ratio/linear so _suspect_sections trigger (c) adjudicates
    # a 1M-only regression (the r13 failure mode: per-group dispatch cost
    # growing with corpus size faster than the math).
    if "emb_lsh_1m" in sections and "emb_lsh" in sections:
        xl, lg = sections["emb_lsh_1m"], sections["emb_lsh"]
        if lg.get("wall") and lg.get("n_large") and lg.get("bands"):
            xl["ratio"] = round(xl["wall"] / lg["wall"], 2)
            xl["linear"] = round(
                (xl["n"] * xl["bands"]) / (lg["n_large"] * lg["bands"]), 2
            )
    calib_mean = (calib_pre + calib_post) / 2.0
    # Self-attribution leg 1 (VERDICT r12 #5): record wall/calib with
    # every wall — a host-drift-inflated wall shows up in calib too,
    # while a plan regression inflates wall_per_calib itself.
    if calib_mean > 0:
        for k in _WALLED:
            if k in sections and "wall" in sections[k]:
                sections[k]["wall_per_calib"] = round(
                    sections[k]["wall"] / calib_mean, 2
                )
        if "serving_1m" in sections and "reshard" in sections["serving_1m"]:
            sections["serving_1m"]["reshard_per_calib"] = round(
                sections["serving_1m"]["reshard"] / calib_mean, 2
            )
    return sections, calib_mean, 0


def _previous_records(n: int = 2) -> list[dict]:
    """Last ``n`` SCALE_RUNS lines, newest first (empty list if none)."""
    path = REPO / "SCALE_RUNS.jsonl"
    if not path.exists():
        return []
    lines = [ln for ln in path.read_text().splitlines() if ln.strip()]
    return [json.loads(ln) for ln in reversed(lines[-n:])]


def _wall(rec: dict, k: str) -> float | None:
    sec = rec.get(k)
    return sec.get("wall") if isinstance(sec, dict) else None


def _ratio_excess(rec: dict, k: str) -> bool:
    """Did this record's section already sit >15% above its linear model?"""
    sec = rec.get(k)
    return (
        isinstance(sec, dict)
        and isinstance(sec.get("ratio"), (int, float))
        and isinstance(sec.get("linear"), (int, float))
        and sec["ratio"] > 1.15 * sec["linear"]
    )


def _prev_ratio(rec: dict, k: str) -> float:
    sec = rec.get(k)
    if isinstance(sec, dict) and isinstance(sec.get("ratio"), (int, float)):
        return float(sec["ratio"])
    return 0.0


def _suspect_sections(sections: dict, history: list[dict]) -> list[str]:
    """Walls needing a host-drift adjudication re-run (VERDICT r13 #2).

    Three triggers, any one suffices:
    (a) wall > 2x the previous line's (the original r13 guard);
    (b) two CONSECUTIVE >=1.25x up-steps — r13's emb_lsh drifted
        52->85->118 s in <2x steps and evaded (a) twice running;
    (c) the section's observed large/small scaling ratio exceeds its own
        linear model by >15% — per-unit cost grew with n, which is either
        skew or a degraded host, and one re-run adjudicates. The margin
        (review r14) keeps a section whose TRUE scaling sits at ~the
        linear model from re-triggering a full re-run every round forever
        (the keep-rule only swaps on a faster wall, never on the ratio).
        Suppression (ADVICE r14): if the PREVIOUS record's same section
        already sat above the margin, the excess reproduced across rounds
        — that is the section's true scaling, already adjudicated once,
        not drift; firing (c) again would double the validation wall
        every round forever. A fresh excess (prev within model) fires.
        Re-fire on COMPOUNDING excess (ADVICE r15): binary suppression
        permanently masked a slow scaling regression on an
        already-excess section (ratio drifting 1.2x -> 2x the model in
        sub-2x steps evades (a) too), so an adjudicated excess re-fires
        once the current ratio materially exceeds the previously
        adjudicated one: ratio > 1.15 * max(prev_ratio, linear).
    """
    prev = history[0] if history else {}
    prev2 = history[1] if len(history) > 1 else {}
    out = []
    for k in _WALLED:
        sec = sections.get(k)
        if not isinstance(sec, dict) or "wall" not in sec:
            continue
        cur, p1, p2 = sec["wall"], _wall(prev, k), _wall(prev2, k)
        if p1 is not None and cur > 2.0 * p1:
            out.append(k)
        elif (
            p1 is not None
            and p2 is not None
            and cur > 1.25 * p1
            and p1 > 1.25 * p2
        ):
            out.append(k)
        elif (
            "ratio" in sec
            and "linear" in sec
            and sec["ratio"] > 1.15 * sec["linear"]
            and (
                not _ratio_excess(prev, k)
                or sec["ratio"] > 1.15 * _prev_ratio(prev, k)
            )
        ):
            # fires on a fresh excess (prev within model — the original
            # bar) AND on a compounding one (current materially above the
            # adjudicated prev excess); a reproduced steady excess stays
            # suppressed
            out.append(k)
    return out


def main() -> int:
    sections, _, rc = _run_once()
    if rc != 0:
        return rc

    # Self-attribution leg 2 (VERDICT r12 #5, triggers widened r13 #2 —
    # see _suspect_sections): a suspicious wall is re-sampled once and the
    # faster section kept. Recalls/counts are deterministic (knob-pinned),
    # so either run's section carries the same correctness payload; only
    # the n=1 wall is being adjudicated.
    suspects = _suspect_sections(sections, _previous_records())
    resample_failed = False
    if suspects:
        sys.stdout.write(
            f"scale_validation: sections {suspects} tripped a resample "
            "trigger (>2x previous wall, two consecutive >=1.25x up-steps, "
            "or ratio >1.15x linear) — re-sampling once (host-drift "
            "adjudication)\n"
        )
        sections2, _, rc2 = _run_once()
        if rc2 != 0:
            # the FIRST run passed every test and parsed every section —
            # a flaky adjudication re-run must not discard it; append it
            # with the suspects marked un-adjudicated instead
            sys.stderr.write(
                "scale_validation: adjudication re-run failed — appending "
                "the first (valid, merely slower) run un-adjudicated\n"
            )
            resample_failed = True
        else:
            for k in suspects:
                if k in sections2 and sections2[k]["wall"] < sections[k]["wall"]:
                    sections[k] = sections2[k]
            sections["calib_resample"] = sections2.get("calib")

    record: dict = {
        "date": datetime.date.today().isoformat(),
        "pytest": "tests/test_scale_knobs.py + tests/test_scale_serving.py "
        "(SPARK_GRAFT_SLOW=1)",
        "resampled": suspects,
        **({"resample_failed": True} if resample_failed else {}),
        **sections,
    }
    if any(k not in record for k in _SECTIONS):
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
