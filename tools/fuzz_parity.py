"""Fuzz the correctness gate: run EVERY queries()/oracle_sql() pair on
RANDOM edge-case-loaded tables instead of the fixed sf0.01 snapshot.

The driver's gate (and tools/check_parity.py) proves Spark ≡ DuckDB on
one dataset; data-dependent divergences — truncating vs floor division
on negative values, 32-bit overflow, empty-string tokenization, ties at
quantile thresholds — can hide behind a benign snapshot (this round's
ADVICE findings were exactly that class).  This tool generates seeded
random tables that deliberately contain those hazards and re-runs the
same compare:

- documents: empty text, whitespace-only, 1-char, unicode words,
  exact-duplicate groups, shared "merge batch"/"scan query" needles,
  a language with a single document (tercile rank edge).
- events: pre-1970 timestamps (floor-division hazard), zero/huge
  values, props {"k": >2^31} (32-bit overflow hazard), duplicate
  (user, ts) pairs.  `value` stays NONNEGATIVE: that is a documented
  testdata invariant the mtail_prog_* oracles bake in (they mirror
  the programs' `val=(\\d+)` captures by assuming every rendered
  line matches — a negative value would be an engine-equivalent
  no-match in Spark but a match in the simplified oracle).
- embeddings: exact-duplicate vectors, near-duplicates, nonzero norms
  (0/0 cosine is deliberately out of contract), EMB_DIM dims.
- TPC-H tables: random but referentially-plausible keys, boundary
  dates, zero quantities/prices.

Usage: python tools/fuzz_parity.py [seed ...]   (default: seeds 1 2)
Exit nonzero on any FAIL.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402

import check_parity  # noqa: E402
from mtail_spark.session import get_spark  # noqa: E402

EMB_DIM = 64

WORDS = (
    "spark merge batch window table scan query value key row fast slow "
    "the a data column agg join sort group stream vector part line big "
    "héllo wörld ñoño 北京 数据 x1 y2 z3"
).split()

LANGS = ["en", "de", "es", "fr", "zh"]
SOURCES = ["web", "books", "code", "wiki"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _text(rnd: random.Random) -> str:
    n = rnd.randrange(0, 40)
    return " ".join(rnd.choice(WORDS) for _ in range(n))


def gen_tables(seed: int, outdir: str) -> None:
    rnd = random.Random(seed)
    os.makedirs(outdir, exist_ok=True)

    # ---- documents: 150 rows with the documented hazards ----------------
    texts = []
    for i in range(150):
        if i < 3:
            t = ""                       # empty
        elif i < 5:
            t = "   "                    # whitespace-only
        elif i < 8:
            t = rnd.choice("abz")        # single char
        elif i < 20:
            t = "merge batch scan query " + _text(rnd)  # grep needles
        else:
            t = _text(rnd)
        texts.append(t)
    # exact-duplicate groups (dedup/bloom/keep-best paths)
    for i in range(20, 45, 5):
        texts[i + 1] = texts[i]
        texts[i + 2] = texts[i]
    langs = [LANGS[i % len(LANGS)] for i in range(149)] + ["xx"]  # n=1 lang
    docs = pd.DataFrame(
        {
            "doc_id": range(1, 151),
            "text": texts,
            "lang": langs,
            "source": [rnd.choice(SOURCES) for _ in range(150)],
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(f"{outdir}/documents.parquet", index=False)

    # ---- events: 2000 rows incl. pre-1970 ts and >2^31 props.k ----------
    base = pd.Timestamp("2024-01-01")
    ts = []
    for i in range(2000):
        if i < 20:  # pre-1970 floor-division hazard
            ts.append(pd.Timestamp("1969-12-31 12:00:00")
                      + pd.Timedelta(minutes=rnd.randrange(0, 700)))
        else:
            ts.append(base + pd.Timedelta(seconds=rnd.randrange(0, 30 * 86400)))
    # exact-duplicate (user_id, ts) and (event_type, ts) rows: every
    # ordering tie-break (sessionize lag windows, LWW gauges, window
    # ranks) must resolve on a deterministic secondary key in BOTH
    # engines — chance collisions are ~0 at this scale, so force them
    for i in range(30, 60, 2):
        ts[i + 1] = ts[i]
    # exact-GAP pairs (next event precisely 1800 s after the previous
    # for the same user) and exact on-the-hour events: gap-merge and
    # tumbling-window boundary semantics must agree engine-to-engine.
    # Seed 8 hit the session boundary by chance and exposed a real
    # >=-vs-> divergence; plant it deterministically ever after.
    for i in range(60, 80, 2):
        ts[i + 1] = ts[i] + pd.Timedelta(seconds=1800)
    for i in range(80, 90):
        ts[i] = ts[i].floor("h")
    users = [rnd.randrange(1, 120) for _ in range(2000)]
    types = [rnd.choice(EVENT_TYPES) for _ in range(2000)]
    # co-occurring PRE-1970 cross-user pair: two 1969 events 30 s
    # apart from different users.  Seeds 4/5 hit this by chance and
    # exposed band_join_stream dropping pre-1970 rows as "late"
    # against Spark's epoch-0 initial watermark (the batch operator
    # was fine); plant it deterministically ever after.
    ts[1] = ts[0] + pd.Timedelta(seconds=30)
    # guaranteed different user while staying inside the generator's
    # documented 1..119 user_id range (r8 ADVICE: +1 could mint 120)
    users[1] = 1 + (users[0] % 119)
    for i in range(30, 60, 2):
        users[i + 1] = users[i]
        types[i + 1] = types[i]
    # exact-gap pairs must share the session key to exercise gap-merge
    for i in range(60, 80, 2):
        users[i + 1] = users[i]
    ks = [rnd.randrange(0, 100) if i % 50 else 3_000_000_000 + i
          for i in range(2000)]
    events = pd.DataFrame(
        {
            "event_id": range(1, 2001),
            "ts": ts,
            "user_id": users,
            "event_type": types,
            "value": [
                rnd.choice([0.0, 1e7, rnd.uniform(0, 500)])
                for _ in range(2000)
            ],
            "props": [json.dumps({"k": k}) for k in ks],
        }
    )
    events.to_parquet(f"{outdir}/events.parquet", index=False)

    # ---- embeddings: 40 rows, dup + near-dup vectors, labels -------------
    def vec():
        return [rnd.uniform(-1, 1) or 0.5 for _ in range(EMB_DIM)]

    vecs = [vec() for _ in range(40)]
    vecs[7] = list(vecs[6])                       # exact dup
    vecs[9] = [v + 0.001 for v in vecs[8]]        # near dup
    emb = pd.DataFrame(
        {
            "vec_id": range(40),
            "embedding": [[float(x) for x in v] for v in vecs],
            "label": [rnd.randrange(0, 4) for _ in range(40)],
        }
    )
    emb.to_parquet(f"{outdir}/embeddings.parquet", index=False)

    # ---- TPC-H-ish tables -------------------------------------------------
    pd.DataFrame(
        {"r_regionkey": range(5),
         "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}
    ).astype({"r_regionkey": "int32"}).to_parquet(
        f"{outdir}/region.parquet", index=False)
    # underscored names matching the testdata domain: the TPC-H
    # queries filter on NATION_3/NATION_5/NATION_7 literally, so a
    # NATION3-style name made Q7/Q8's nation slices empty under fuzz
    # and their non-empty paths were never exercised
    pd.DataFrame(
        {"n_nationkey": range(10),
         "n_name": [f"NATION_{i}" for i in range(10)],
         "n_regionkey": [i % 5 for i in range(10)]}
    ).astype({"n_nationkey": "int32", "n_regionkey": "int32"}).to_parquet(
        f"{outdir}/nation.parquet", index=False)
    ncust = 80
    pd.DataFrame(
        {"c_custkey": range(1, ncust + 1),
         "c_name": [f"Customer#{i}" for i in range(1, ncust + 1)],
         "c_nationkey": [rnd.randrange(0, 10) for _ in range(ncust)],
         "c_acctbal": [round(rnd.uniform(-999, 9999), 2) for _ in range(ncust)],
         "c_mktsegment": [rnd.choice(["BUILDING", "AUTOMOBILE", "MACHINERY"])
                          for _ in range(ncust)]}
    ).astype({"c_nationkey": "int32"}).to_parquet(
        f"{outdir}/customer.parquet", index=False)
    nsupp = 20
    pd.DataFrame(
        {"s_suppkey": range(1, nsupp + 1),
         "s_name": [f"Supplier#{i}" for i in range(1, nsupp + 1)],
         "s_nationkey": [rnd.randrange(0, 10) for _ in range(nsupp)],
         "s_acctbal": [round(rnd.uniform(-999, 9999), 2) for _ in range(nsupp)]}
    ).astype({"s_nationkey": "int32"}).to_parquet(
        f"{outdir}/supplier.parquet", index=False)
    npart = 50
    pd.DataFrame(
        {"p_partkey": range(1, npart + 1),
         "p_name": [f"part {i}" for i in range(1, npart + 1)],
         # include the literal brands/types the TPC-H queries filter
         # on (Brand#12/23/34 for Q17/Q19, ECONOMY%/PROMO% for
         # Q8/Q14) so their non-empty paths fuzz for real
         "p_brand": [rnd.choice(["Brand#12", "Brand#23", "Brand#34",
                                 "Brand#1", "Brand#5"])
                     for _ in range(npart)],
         "p_type": [rnd.choice(["SMALL PLATED", "LARGE BRUSHED",
                                "STANDARD TWISTED",
                                "ECONOMY ANODIZED STEEL",
                                "PROMO BURNISHED COPPER"])
                    for _ in range(npart)],
         "p_size": [rnd.randrange(1, 50) for _ in range(npart)],
         "p_retailprice": [round(rnd.uniform(900, 2000), 2)
                           for _ in range(npart)]}
    ).astype({"p_size": "int32"}).to_parquet(
        f"{outdir}/part.parquet", index=False)
    # half the order/line dates land inside the TPC-H query windows
    # (1996-1997): with the original all-2024 dates every fixed-date
    # TPC-H predicate (Q4 quarter, Q6/Q15 quarters, Q7 two-year span,
    # Q10 quarter, Q14 month, Q22 recency) selected ZERO rows, so fuzz
    # exercised those queries only on the empty path.
    tpch_base = pd.Timestamp("1996-01-01")

    def _mixed_date(rng_days: int):
        if rnd.random() < 0.5:
            return tpch_base + pd.Timedelta(days=rnd.randrange(0, 730))
        return base + pd.Timedelta(days=rnd.randrange(0, rng_days))

    nord = 400
    pd.DataFrame(
        {"o_orderkey": range(1, nord + 1),
         "o_custkey": [rnd.randrange(1, ncust + 1) for _ in range(nord)],
         "o_orderstatus": [rnd.choice(["O", "F", "P"]) for _ in range(nord)],
         "o_totalprice": [round(rnd.uniform(0, 300000), 2)
                          for _ in range(nord)],
         "o_orderdate": [_mixed_date(365) for _ in range(nord)],
         "o_orderpriority": [rnd.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"])
                             for _ in range(nord)]}
    ).to_parquet(f"{outdir}/orders.parquet", index=False)
    nli = 1500
    ship = [_mixed_date(400) for _ in range(nli)]
    # planted hazard: September 1996 (tpch_q14's month) carries rows
    # whose revenue rounds to ZERO cents — a ratio computed as
    # num DIV den must yield NULL, never an ANSI divide-by-zero error
    price = [
        0.0 if (d.year == 1996 and d.month == 9)
        else round(rnd.uniform(0, 90000), 2)
        for d in ship
    ]
    pd.DataFrame(
        {"l_orderkey": [rnd.randrange(1, nord + 1) for _ in range(nli)],
         "l_partkey": [rnd.randrange(1, npart + 1) for _ in range(nli)],
         "l_suppkey": [rnd.randrange(1, nsupp + 1) for _ in range(nli)],
         "l_linenumber": [rnd.randrange(1, 8) for _ in range(nli)],
         "l_quantity": [float(rnd.choice([0, 1, 25, 50]))
                        for _ in range(nli)],
         "l_extendedprice": price,
         "l_discount": [round(rnd.choice([0.0, 0.05, 0.1]), 2)
                        for _ in range(nli)],
         "l_tax": [round(rnd.choice([0.0, 0.04, 0.08]), 2)
                   for _ in range(nli)],
         "l_returnflag": [rnd.choice(["A", "N", "R"]) for _ in range(nli)],
         "l_linestatus": [rnd.choice(["O", "F"]) for _ in range(nli)],
         "l_shipdate": ship}
    ).astype({"l_linenumber": "int32"}).to_parquet(
        f"{outdir}/lineitem.parquet", index=False)


def main() -> int:
    seeds = [int(a) for a in sys.argv[1:]] or [1, 2]
    spark = get_spark("fuzz-parity", cpus=8)
    total_fail = 0
    for seed in seeds:
        outdir = os.path.join(
            tempfile.gettempdir(), f"fuzz_sf_{os.getuid()}_{seed}"
        )
        shutil.rmtree(outdir, ignore_errors=True)
        gen_tables(seed, outdir)
        print(f"=== seed {seed} -> {outdir}")
        _, n_fail, _ = check_parity.run(
            outdir, spark=spark, label=f"s{seed}:"
        )
        total_fail += n_fail
    return 1 if total_fail else 0


if __name__ == "__main__":
    sys.exit(main())
