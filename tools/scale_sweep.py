#!/usr/bin/env python3
"""Scale-regression sweep: time EVERY __spark_entry__.queries() entry at
sf0.1 and at the 10x derived fixture (tools/make_scale_fixture.py) and
flag super-linear ratios. This is how the minhash mega-cluster blowup
was caught (22x for 10x data); the sweep makes that check systematic.

Usage: python tools/scale_sweep.py [base_dir] [scaled_dir] [ratio_flag]
Writes one line per query: name, t_base, t_scaled, ratio; FLAG if
ratio > threshold (default 5.0 — generous because sub-second bases are
noisy). Exit code 1 if anything is flagged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Ops whose work is provably super-linear in the input BY DEFINITION —
# not implementation flaws. The sweep reports their ratios but does not
# flag them.
EXPECTED_SUPERLINEAR = {
    # pure inequality join over one table with itself: O(n^2) pair
    # space, no equi-key to hash on. The scale paths for inequality
    # shapes are asof_join (window idiom) and banded range joins.
    "join_theta",
    # exact top-k scores every corpus vector per query BY DEFINITION
    # (O(Q*N) — it is the recall baseline the ANN variants are measured
    # against). The scale paths are similarity_ann_lsh / similarity_ann_ivf.
    "similarity_topk_bruteforce",
    # same O(Q*N) exact ranking, three prefix dims side by side — the op
    # EXISTS to measure prefix-vs-full recall exactly; the scale path is
    # using the cheap prefix as the first pass inside IVF/PQ, not
    # running the exact study op on the full corpus.
    "similarity_matryoshka_topk",
    # exact triangle LISTING is Θ(output); the K× fixture replicates
    # documents verbatim, so every near-dup clique grows K× and its
    # triangle count grows K³ — the op's output itself is super-linear
    # in the input (sweeps measure 26-41x runtime, run-to-run noisy
    # because output-dominated, against ~1000x triangle output).
    "graph_triangles",
    # contaminated-pair OUTPUT is itself K² under K× verbatim-replica
    # fixtures (every replica of a train doc pairs every replica of an
    # eval doc); at organic growth pairs grow ~linearly. The 2% stop-gram
    # df-cap (llm_text.py contamination_check) bounds the per-gram join
    # fan-out either way.
    "contamination_check",
    # the op's OUTPUT is the full near-dup pair list: K× byte-identical
    # replicas share a pHash, so every replica group emits K² pairs by
    # SPEC — Θ(output), the graph_triangles argument. (At organic
    # growth near-dup groups stay small and the banded join is linear.)
    # 10× sweep: 3.9×, tracking pair output, not plan inefficiency.
    "multimodal_phash_dedup",
    # per-iteration work is linear in the EDGE LIST, but the edge list
    # is dedup_simhash's near-dup pair output, which itself grows K²
    # under K× verbatim replication (cliques of identical docs) — input
    # growth inherited from the pairwise family above, not a plan flaw.
    # 10× sweep: 4.9× directly under the 5.0 flag; annotated so host
    # noise can't flip it.
    "graph_pagerank",
}


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scaled = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled"
    flag_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0

    import __spark_entry__ as entrymod
    from duck_server_spark.engine.session import get_session

    spark = get_session("scale_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # optional spot-check subset (comma-separated names) — used by the
    # 100x two-decade step, which only runs the heaviest ops
    only = os.environ.get("SCALE_SWEEP_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"SCALE_SWEEP_ONLY names not in queries(): {unknown}")
        qs = {n: qs[n] for n in names}

    def run(fn, sf_dir: str) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    rows = []
    flagged = []
    for name, fn in qs.items():
        try:
            # warm once at base so first-use costs (view registration,
            # UDF pickling) don't pollute the base measurement; then
            # min-of-2 per SF — single-run timings flagged two linear
            # ops (events_gapfill, multimodal_frame_sample) in the r3
            # sweep purely from scheduler jitter on sub-second bases
            run(fn, base)
            tb = min(run(fn, base) for _ in range(2))
            ts = min(run(fn, scaled) for _ in range(2))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {str(exc)[:120]}", flush=True)
            flagged.append((name, -1.0))
            continue
        ratio = ts / max(tb, 1e-9)
        mark = ""
        if name in EXPECTED_SUPERLINEAR:
            mark = "  (expected-superlinear)"
        elif ratio > flag_ratio and ts > 2.0:  # ignore noisy sub-2s scaled runs
            mark = "  <-- FLAG"
            flagged.append((name, ratio))
        print(f"{name}: base={tb:.2f}s scaled={ts:.2f}s ratio={ratio:.1f}x{mark}", flush=True)
        rows.append({"query": name, "base_sec": round(tb, 3), "scaled_sec": round(ts, 3), "ratio": round(ratio, 2)})

    out = {"base": base, "scaled": scaled, "flag_ratio": flag_ratio,
           "flagged": [n for n, _ in flagged], "rows": rows}
    with open("/tmp/scale_sweep.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nflagged: {[n for n, _ in flagged]} (details /tmp/scale_sweep.json)")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
