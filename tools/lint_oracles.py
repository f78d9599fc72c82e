#!/usr/bin/env python3
"""Oracle-portability lint — the recurring driver-vs-local DuckDB traps,
mechanized (VERDICT r7 item 6). Greps every oracleSql statement for the
constructs that have actually burned a round and fails the local gate
with the known-portable rewrite named.

Usage: python3 tools/lint_oracles.py <oracle_sql.json> [sfDir]
       (the file graft.Verify dumps; run after step 1 of the verify
        recipe, before trusting step 2's green. sfDir defaults to
        /root/testdata/sf0.001 and enables the DESCRIBE type pass;
        pass "-" to skip it when DuckDB/testdata is unavailable.)

HARD failures (exit 1):
  * any oracle whose DESCRIBE'd result schema contains a type Spark
    cannot emit — HUGEINT/UHUGEINT (DuckDB sum(BIGINT) promotes) or
    the unsigned integer family. The round-9 embed_centroid_drift
    driver hash-FAIL: values matched, but the driver's DuckDB hashes
    HUGEINT differently than local fetch. Rewrite: CAST(... AS BIGINT)
    at the point the sum/derived column is emitted.
  * string_agg(DISTINCT ...)  — DISTINCT + ORDER BY interaction is
    version-fragile (the round-6 q41 driver hash-FAIL). Rewrite:
    string_agg with ORDER BY INSIDE the aggregate over a pre-deduped
    subquery (see q41_modern_aggs / dq_suggest).
  * median(...)               — interpolation differs across versions /
    engines on even counts. Rewrite: dyadic-rank selection over the
    x2-scaled values (see q41_modern_aggs).
  * >= 12 numbered CTEs sharing one stem (r1 AS, r2 AS, ...) — long
    unrolled dependent-CTE chains plan pathologically in DuckDB (a
    25+ CPU-minute check_oracle run). Rewrite: WITH RECURSIVE (the
    graph_components oracle is the template); graph_kcore's 9-round
    unroll is the accepted ceiling.

ADVISORY (reported, exit still 0):
  * a `//` whose numerator is a parenthesized top-level subtraction with
    no pmod — NOT a cross-engine hazard (Spark `div` and DuckDB `//`
    both truncate toward zero; measured, see Events.arCoefficients) but
    a floor-convention hazard: if the numerator can go negative the
    result truncates where the repo convention floors. Each listed site
    needs either a non-negativity argument (most have one: cumulative
    counts, abs(), maxima minus members) or the pmod identity
    `(a - ((a % b) + b) % b) // b` on BOTH engines.
"""
import json
import re
import sys
from collections import Counter

HARD = [
    (re.compile(r'string_agg\s*\(\s*distinct', re.I),
     "string_agg(DISTINCT ...): version-fragile DISTINCT/ORDER BY "
     "interaction — use string_agg(x, sep ORDER BY x) over a pre-deduped "
     "subquery (q41_modern_aggs / dq_suggest pattern)"),
    (re.compile(r'\bmedian\s*\(', re.I),
     "median(): interpolation is version/engine-dependent on even counts "
     "— use dyadic-rank selection over x2-scaled values (q41_modern_aggs "
     "pattern)"),
]
CTE_STEM = re.compile(r'\b([a-z_]+?)(\d+)\s+AS\s*\(', re.I)
MAX_CTE_FAMILY = 11  # graph_kcore's 9-round unroll is the accepted max


def numerator_operand(sql, idx):
    """The multiplicative operand chain immediately left of sql[idx]
    (a '//'): balanced paren groups / identifiers joined by '*'."""
    j = idx
    def skip_ws(j):
        while j > 0 and sql[j - 1] in ' \t\n':
            j -= 1
        return j
    parts = []
    while True:
        j = skip_ws(j)
        if j == 0:
            break
        if sql[j - 1] == ')':
            depth = 0
            k = j
            while k > 0:
                if sql[k - 1] == ')':
                    depth += 1
                elif sql[k - 1] == '(':
                    depth -= 1
                    if depth == 0:
                        break
                k -= 1
            parts.insert(0, sql[k - 1:j])
            j = k - 1
            # a call like abs(...) — absorb the function name
            j2 = skip_ws(j)
            m = re.search(r'([A-Za-z_][A-Za-z_0-9.]*)$', sql[:j2])
            if m and j2 == j:
                parts[0] = m.group(1) + parts[0]
                j = m.start()
        else:
            m = re.search(r'([A-Za-z_0-9.]+)$', sql[:j])
            if not m or m.end() != j:
                break
            parts.insert(0, m.group(1))
            j = m.start()
        j2 = skip_ws(j)
        if j2 > 0 and sql[j2 - 1] == '*':
            parts.insert(0, '*')
            j = j2 - 1
            continue
        break
    return ''.join(parts)


def signed_div_sites(sql):
    sites = []
    for m in re.finditer(r'//', sql):
        op = numerator_operand(sql, m.start())
        if '%' in op:
            continue  # pmod identity already applied
        if re.search(r'-\s*0\b', op):
            continue  # subtracting literal 0 (histogram lo-anchors)
        # top-level '-' inside the operand's own paren group(s)
        depth = 0
        flagged = False
        for k, c in enumerate(op):
            if c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            elif c == '-' and depth == 1 \
                    and not (k + 1 < len(op) and op[k + 1] == '>'):
                # minus at the operand's outermost group — but skip
                # abs(...)/greatest(...)/least(...) wrappers, whose
                # results are non-negative by construction here
                head = op.split('(', 1)[0].lower()
                if head not in ('abs', 'greatest', 'least'):
                    flagged = True
        if flagged:
            sites.append(op[-70:])
    return sites


BAD_TYPES = re.compile(
    r'\b(HUGEINT|UHUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT)\b', re.I)
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def describe_pass(oracle, sf_dir, failures):
    """DESCRIBE every oracle against the sf parquet views and hard-fail
    any result schema with a type Spark can't emit (VERDICT r9 item 2:
    lint the class, not the instance)."""
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, sql in sorted(oracle.items()):
        try:
            schema = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # unDESCRIBEable oracle is itself a failure
            failures.append(f"{name}: DESCRIBE failed — {e}")
            continue
        for col, typ, *_ in schema:
            if BAD_TYPES.search(str(typ)):
                failures.append(
                    f"{name}: result column `{col}` is {typ} — Spark "
                    f"cannot emit it and the driver's DuckDB hashes it "
                    f"differently than local fetch (round-9 "
                    f"embed_centroid_drift). CAST(... AS BIGINT) where "
                    f"the sum/derived value is emitted.")


def main(path, sf_dir="/root/testdata/sf0.001"):
    oracle = json.load(open(path))
    failures, advisories = [], []
    for name, sql in sorted(oracle.items()):
        for pat, msg in HARD:
            if pat.search(sql):
                failures.append(f"{name}: {msg}")
        fam = Counter(m.group(1).lower() for m in CTE_STEM.finditer(sql))
        for stem, n in fam.items():
            if n > MAX_CTE_FAMILY:
                failures.append(
                    f"{name}: {n} unrolled CTEs on stem '{stem}N' — "
                    f"DuckDB plans long dependent-CTE chains "
                    f"pathologically; use WITH RECURSIVE "
                    f"(graph_components oracle is the template)")
        for site in signed_div_sites(sql):
            advisories.append(f"{name}: signed-looking `//` numerator "
                              f"`...{site}` — prove non-negativity or "
                              f"apply the pmod identity")
    if sf_dir != "-":
        describe_pass(oracle, sf_dir, failures)
    if "-v" in sys.argv:
        for a in advisories:
            print(f"ADVISORY {a}")
    for f in failures:
        print(f"FAIL {f}")
    print(f"== lint: {len(failures)} hard failure(s), "
          f"{len(advisories)} advisory site(s) (-v to list) over "
          f"{len(oracle)} oracle statements ==")
    return 1 if failures else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "-v"]
    sys.exit(main(*argv[:2]))
