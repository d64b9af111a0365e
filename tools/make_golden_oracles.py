"""Generate (or verify) pinned-expected-output parquet oracles for the
geometry / near-dup driver queries whose semantics ANSI SQL cannot
express (Sherbend, chordal axis, DP/VW, MinHash/SimHash/winnowing
LSH, IVF, raster tiles, media decode).

Provenance contract (FIXTURES.md "Golden oracles"): each file is the
exact output of the CURRENT kernels at the named scale factor,
generated once by this tool and cross-validated by
  (a) the 43 reference-golden pytest cases (exact vertex sequences)
      and the property/invariant suites that gate those same kernels,
  (b) a determinism re-run at a DIFFERENT parallelism (local[8] vs
      local[32]) asserting an identical order-insensitive multiset
      (``--check`` mode below),
so a future kernel regression shows up as a rows+schema+hash FAIL in
the driver's CORRECTNESS gate instead of a silent chk drift.

Usage:
    python tools/make_golden_oracles.py generate [sf_dir ...]
    python tools/make_golden_oracles.py check    [sf_dir ...]

``generate`` writes tests/data/expected/<sf_name>/<query>.parquet via
``DataFrame.toArrow()`` (bit-faithful types: int8/int32/int64/float64/
utf8/bool round-trip exactly through parquet and DuckDB).
``check`` re-runs every query (use SPARK_GRAFT_CPUS to vary
parallelism) and fails if the canonical multiset differs from the
committed file.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"]


def expected_dir(sf_name: str) -> str:
    return os.path.join(REPO, "tests", "data", "expected", sf_name)


def canon_multiset(tbl: pa.Table) -> list[str]:
    """Order-insensitive canonical form: rows as strings with columns
    sorted by name, floats at full repr (goldens must be bit-identical,
    not merely 6-decimal-identical)."""
    cols = sorted(tbl.column_names)
    pylists = [tbl.column(c).to_pylist() for c in cols]
    rows = ["\x01".join(repr(v) for v in vals) for vals in zip(*pylists)]
    return sorted(rows)


def golden_query_names() -> list[str]:
    from geo_sim_processing_a_spark.plans.driver_queries import (
        GOLDEN_ORACLE_QUERIES)
    return list(GOLDEN_ORACLE_QUERIES)


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "generate"
    sf_dirs = sys.argv[2:] or DEFAULT_SFS
    if mode not in ("generate", "check"):
        print(f"unknown mode {mode}", file=sys.stderr)
        return 2

    from geo_sim_processing_a_spark.plans.driver_queries import all_queries
    from geo_sim_processing_a_spark.plans.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("golden_oracles", cpus=cpus, shuffle_partitions=cpus)
    qs = all_queries()
    names = golden_query_names()
    # SPARK_GRAFT_GOLDEN_ONLY=q_a,q_b restricts generate/check to named
    # queries (adding a NEW golden must not rewrite the existing pins —
    # FIXTURES.md G6 regeneration protocol)
    only = os.environ.get("SPARK_GRAFT_GOLDEN_ONLY", "")
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        unknown = wanted - set(names)
        if unknown:
            print(f"unknown golden queries: {sorted(unknown)}",
                  file=sys.stderr)
            return 2
        names = [n for n in names if n in wanted]
    failures = []
    for sf_dir in sf_dirs:
        sf_name = os.path.basename(sf_dir.rstrip("/"))
        out_dir = expected_dir(sf_name)
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            tbl = qs[name](spark, sf_dir).toArrow()
            path = os.path.join(out_dir, f"{name}.parquet")
            if mode == "generate":
                pq.write_table(tbl, path, compression="zstd")
                print(f"wrote {path}: {tbl.num_rows} rows, "
                      f"{os.path.getsize(path)} bytes")
            else:
                if not os.path.exists(path):
                    failures.append((sf_name, name, "missing golden file"))
                    print(f"FAIL {sf_name}/{name}: missing {path}")
                    continue
                pinned = pq.read_table(path)
                if sorted(pinned.column_names) != sorted(tbl.column_names):
                    failures.append((sf_name, name, "columns"))
                    print(f"FAIL {sf_name}/{name}: columns "
                          f"{sorted(pinned.column_names)} vs "
                          f"{sorted(tbl.column_names)}")
                elif canon_multiset(pinned) != canon_multiset(tbl):
                    failures.append((sf_name, name, "values"))
                    print(f"FAIL {sf_name}/{name}: value multiset differs "
                          f"({pinned.num_rows} pinned vs {tbl.num_rows} live)")
                else:
                    print(f"ok   {sf_name}/{name}: {tbl.num_rows} rows "
                          f"bit-identical at local[{cpus}]")
    spark.stop()
    if failures:
        print(f"{len(failures)} FAILURES", file=sys.stderr)
        return 1
    print("all golden oracles verified" if mode == "check"
          else "all golden oracles written")
    return 0


if __name__ == "__main__":
    sys.exit(main())
