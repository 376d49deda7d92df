"""Skew-mitigation operators: salting for hot keys (100 TB design).

The reference never hits skew (2k rows); at training-data scale a hot
group key (one giant company, one dominant event_type) makes a single
reducer the straggler. Two standard mitigations, both pure relational
rewrites whose RESULTS are identical to the naive plan — so the DuckDB
oracle checks the un-salted SQL:

- salted aggregation: group by (key, salt) first — every partition
  does bounded work — then re-aggregate by key. Count/sum/min/max are
  mergeable, so the two-stage result is exact.
- salted join: the build side is replicated SALT ways, the probe side
  tags each row with a salt derived from a NON-join column; the join
  key becomes (key, salt), spreading one hot key over SALT reducers.

Salts must be deterministic (no rand(): retried tasks would re-salt
differently and break exactly-once shuffle file reuse) — derived from
stable row attributes via pmod(hash(...)).

AQE's skewedJoin handles the join case automatically when statistics
surface the skew (enabled in session.py); explicit salting is the
belt-and-braces for aggregation skew and for engines/joins AQE can't
split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

SALT_BUCKETS = 16


def salt_column(*stable_cols: str, buckets: int = SALT_BUCKETS) -> Column:
    """Deterministic salt in [0, buckets) from non-join-key columns."""
    return F.pmod(F.hash(*[F.col(c) for c in stable_cols]), F.lit(buckets))


def salted_count(
    df: DataFrame, group_col: str, salt_src: str, buckets: int = SALT_BUCKETS
) -> DataFrame:
    """Two-stage skew-proof COUNT(*) GROUP BY: partial counts on
    (key, salt), exact merge on key. One extra (tiny) shuffle of
    |keys|×buckets rows buys bounded per-reducer work on the big one."""
    partial = (
        df.withColumn("_salt", salt_column(salt_src, buckets=buckets))
        .groupBy(group_col, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(group_col).agg(F.sum("_partial").alias("n"))


@query(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag AS flag, COUNT(*) AS n
    FROM lineitem GROUP BY 1 ORDER BY flag
    """,
)
def q_agg_salted_skew(spark, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation on lineitem's 3-value l_returnflag — a
    genuinely skewed key (3 groups over any number of reducers). The
    salted two-stage plan spreads each flag over 16 partial groups;
    the merged result is exactly COUNT(*) GROUP BY."""
    li = load(spark, sf_dir, "lineitem")
    return (
        salted_count(li, "l_returnflag", "l_orderkey")
        .select(F.col("l_returnflag").alias("flag"), "n")
        .orderBy("flag")
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    salt_src: str,
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Hot-key equi-join: replicate the build side `buckets` ways and
    join on (key, salt). Build-side blowup is buckets×|build| — use for
    moderate build sides with a skewed probe. This helper now ALWAYS
    forces the shuffled-hash path (r16 measurement below): a build side
    small enough to broadcast should use a plain broadcast join instead
    of salting at all (broadcast replicates to every executor anyway,
    so salting buys nothing and pays buckets× replication first). AQE
    skew-split covers the sort-merge case."""
    salted_probe = probe.withColumn("_salt", salt_column(salt_src, buckets=buckets))
    # Pin the shuffle strategy: salting exists to spread one hot key
    # over SALT reducers, which REQUIRES a shuffle by (key, salt).
    # Left to Catalyst, a build side under autoBroadcastJoinThreshold
    # is collected into a buckets×|build| broadcast relation — the
    # worst of both (r16 isolated profile: 3.2–10.6 s vs 1.1–1.6 s
    # shuffled at sf0.1, A/B min 0.50×), and the exact shape salting
    # is meant to avoid at scale.
    salted_build = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    ).hint("shuffle_hash")
    cond = (salted_probe[probe_key] == salted_build[build_key]) & (
        salted_probe["_salt"] == salted_build["_salt"]
    )
    return salted_probe.join(salted_build, cond).drop("_salt")


@query(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority AS priority, COUNT(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1 ORDER BY priority
    """,
)
def q_join_salted_skew(spark, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders with a salted key: each orderkey's lineitem
    rows scatter over 16 salt buckets (salt from l_linenumber — stable,
    independent of the join key), orders rows are replicated to meet
    them. Same rows out as the plain equi-join, no reducer ever owns a
    whole hot key."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, orders, "l_orderkey", "o_orderkey", "l_linenumber")
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n_lines"))
        .orderBy("priority")
    )


#: Count-min-sketch shape: CMS_DEPTH independent hash rows of
#: CMS_WIDTH counters, and the heavy-hitter report size.
CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_TOP = 15

_CMS_HASH = (
    "CAST(('0x' || substr(md5('cms' || CAST({salt} AS VARCHAR) || '#' || {col}),"
    " 1, 8)) AS BIGINT) % " + str(CMS_WIDTH)
)


def cms_bucket(salt_col, token_col):
    """Counter column for a (depth-salt, key) pair — md5-portable so
    the DuckDB oracle addresses the identical cell."""
    from job_market_research_spark.ml.neardup import portable_hash

    return F.pmod(
        portable_hash(
            F.concat(
                F.lit("cms"), salt_col.cast("string"), F.lit("#"), token_col
            )
        ),
        F.lit(CMS_WIDTH),
    )


@query(
    "agg_cms_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT t AS token
      FROM documents,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(t)
      WHERE t <> ''
    ),
    counters AS (
      SELECT d, {_CMS_HASH.format(salt="d", col="token")} AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM tok, unnest(generate_series(0, {CMS_DEPTH - 1})) AS s(d)
      GROUP BY 1, 2
    ),
    vocab AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS true_n
      FROM tok GROUP BY token
    ),
    probe AS (
      SELECT v.token, v.true_n, MIN(c.c) AS cms_est
      FROM vocab v,
           unnest(generate_series(0, {CMS_DEPTH - 1})) AS s(d)
      JOIN counters c
        ON c.d = s.d AND c.b = {_CMS_HASH.format(salt="s.d", col="v.token")}
      GROUP BY v.token, v.true_n
    )
    SELECT token, true_n, cms_est FROM probe
    ORDER BY cms_est DESC, token LIMIT {CMS_TOP}
    """,
    tags=("sketch", "skew", "beyond"),
)
def q_agg_cms_heavy_hitters(spark, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005):
    a CMS_DEPTH×CMS_WIDTH counter grid over the token stream, probed
    for the estimated-hottest tokens — the mergeable-sketch form of
    hot-key detection that feeds this module's salting decisions
    (a 100 TB pipeline finds its skewed keys from a sketch pass, not
    an exact vocab count).

    Scale shape: the counter grid aggregates with map-side partials
    into a CONSTANT-size table (depth×width = 256 cells — each
    partition's grid merges by cell addition, the defining CMS
    property), which then BROADCASTS into the probe join; the probe
    enumerates each candidate's CMS_DEPTH cells map-side and takes the
    row-wise MIN. The exact vocab count rides along as the contract
    twin (cms_est ≥ true_n always; pinned in tests) — at 100 TB you
    drop the exact column and keep the sketch, which never shuffles
    more than 256 rows. Hashes are md5-portable; all counts integer."""
    tok = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"))
        .filter(F.col("token") != "")
    )
    # One corpus pass: the vocab count is the only corpus-sized
    # aggregation; the counter grid derives from the VOCAB weighted by
    # true_n (identical cell sums — addition is associative), instead
    # of re-exploding the raw token stream CMS_DEPTH×.
    vocab = tok.groupBy("token").agg(F.count("*").alias("true_n"))
    salted = vocab.select(
        "token",
        "true_n",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"),
    )
    counters = (
        salted.select(
            "d", cms_bucket(F.col("d"), F.col("token")).alias("b"), "true_n"
        )
        .groupBy("d", "b")
        .agg(F.sum("true_n").alias("c"))
    )
    probe = (
        vocab.select(
            "token",
            "true_n",
            F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d"),
        )
        .withColumn("b", cms_bucket(F.col("d"), F.col("token")))
        .join(F.broadcast(counters), ["d", "b"])
        .groupBy("token", "true_n")
        .agg(F.min("c").alias("cms_est"))
    )
    return probe.orderBy(F.desc("cms_est"), "token").limit(CMS_TOP)
