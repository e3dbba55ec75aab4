"""Coverage ladder: adjudicate the low-coverage behavior of the cenX
pipeline (round-4 verdict item 1 — the 120u/9x run collapsed to 87 kb of
246.6 kb with 26/525 reads placed while a 10.1x run had succeeded).

For each coverage rung this script runs the FULL pipeline at 120 units /
5.5% uniform noise / fixed seed, in two modes:
  fixed — the reference's exact semantics (min edge coverage 4,
          distance_based_kmer_recruitment.py:131-149);
  auto  — coverage-adaptive edge cutoff (KmerRecruitmentConfig.
          auto_min_coverage): one sweep at floor cutoff 2, then the
          largest non-starved cutoff <= 4 is chosen host-side.

The physics: a TRUE distance-d edge's expected count is (reads spanning
both unit copies) x survival^2 ~ 0.116 x spanning reads at 5.5% noise.
At total coverage ~9x that is ~0.9 < 4 — the fixed cutoff starves BY
CONSTRUCTION (the reference, run on such input, starves identically;
its README assumes coverage 32). The ladder measures where the cliff
sits and whether the adaptive cutoff restores assembly below it.

Writes benchmarks/coverage_ladder.json. Run from the repo root:
    python benchmarks/coverage_ladder.py [--quick]
(--quick: three rungs only, for smoke-testing the harness).
"""

import json
import logging
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_cenx_production import run_production  # noqa: E402

N_UNITS = 120
NOISE = 0.055
RUNGS = [8, 10, 12, 16, 24, 32]
AUTO_RUNGS = [8, 10, 12, 16]       # auto mode re-runs below the cliff


def slim(summary):
    """Ladder row: drop the bulky per-chunk list, keep the verdicts."""
    out = {k: v for k, v in summary.items()
           if k not in ("divergence_chunks", "reference_envelope")}
    out["divergence_chunk_max"] = max(
        summary.get("divergence_chunks") or [0.0])
    return out


def main():
    quick = "--quick" in sys.argv
    rungs = [8, 16, 32] if quick else RUNGS
    auto_rungs = [8] if quick else AUTO_RUNGS
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    rows = []
    for cov in rungs:
        for mode in (["fixed", "auto"] if cov in auto_rungs
                     else ["fixed"]):
            tag = f"ladder{N_UNITS}u_c{cov}_{mode}"
            print(f"=== rung coverage {cov} ({mode}) ===", flush=True)
            try:
                s = run_production(
                    N_UNITS, float(cov), NOISE, tag=tag, fresh=True,
                    auto_min_coverage=(mode == "auto"),
                    save_artifact=False)
                row = slim(s)
            except Exception:
                traceback.print_exc()
                row = {"error": traceback.format_exc(limit=3)}
            row["rung_coverage"] = cov
            row["mode"] = mode
            rows.append(row)
            out_fn = os.path.join(os.path.dirname(os.path.abspath(
                __file__)), "coverage_ladder.json")
            with open(out_fn, "w") as f:
                json.dump({"n_units": N_UNITS, "noise": NOISE,
                           "rows": rows}, f, indent=2)
            print(f"ladder: {len(rows)} rows -> {out_fn}", flush=True)


if __name__ == "__main__":
    main()
