"""End-to-end corpus-curation funnel (r8 wave 85).

One declarative plan composing the filtering battery a CCNet/RedPajama-
style pretraining pipeline runs nightly over the raw corpus — each stage
applied to the previous stage's survivors, reported as a five-row funnel
(docs kept, token mass kept, fraction of raw):

  0 raw          the corpus
  1 lang_en      stopword-rate language ID, keep predicted 'en'
                 (exactly the registered ``lang_id_prediction`` plan)
  2 quality      the seven Gopher rules (exactly the registered
                 ``gopher_quality_filter`` plan)
  3 exact_dedup  normalized-md5 fingerprint, keep min doc_id per class
  4 near_dup     3-gram Jaccard >= 0.5 candidate pairs (df-capped
                 inverted index) -> connected components -> keep each
                 cluster's min-id canonical

The oracle embeds the lang and quality REGISTERED ORACLES as subqueries
(read from the registry at import time — plans/__init__ imports this
module last), so the funnel can never drift from the operators it
composes: if a rule constant changes in gopher_quality_filter, this
oracle changes with it.

DEDUP TRACERS: the shipped gate fixtures have no exact duplicates
(sf0.1 has 8), so stages 3-4 would be vacuous exactly where the driver
hash-checks. Like the wave-82 license-header injection, the funnel
injects its own tracers AT THE DEDUP BOUNDARY: the 8 lowest-id stage-2
survivors are re-added once verbatim (caught by stage 3: same
fingerprint, higher id) and once with five stopwords appended (caught
by stage 4: different fingerprint, Jaccard >= ~0.85 to the base). The
oracle mirrors the injection, so both dedup stages demonstrably remove
mass at every SF.

Scale: stages 1-2 are narrow per-doc projections; stage 3 is one hash
groupBy on the fingerprint; stage 4 is the df-capped inverted-index
pair join plus min-label-propagation components (O(cluster diameter)
rounds) — the same bounded plans as the standalone registered queries,
just composed. The multi-consumer survivor frames are localCheckpointed
once each (at cluster scale: persist(DISK) instead).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table as T
from ..functions.text import fingerprint, tokens
from .registry import ORACLES, query

_EX_OFF = 10_000_000  # exact-tracer id offset
_NR_OFF = 20_000_000  # near-tracer id offset
_N_TRACERS = 8
_NR_SUFFIX = " the and for with that"

_NTOK_SQL = (
    "len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x != ''))"
)

_FUNNEL_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, text, cast({_NTOK_SQL} AS BIGINT) AS n_tok
      FROM documents
    ),
    s1 AS (
      SELECT d.* FROM d
      JOIN ({ORACLES["lang_id_prediction"]}) l USING (doc_id)
      WHERE l.predicted_lang = 'en'
    ),
    s2 AS (
      SELECT s1.* FROM s1
      JOIN ({ORACLES["gopher_quality_filter"]}) q USING (doc_id)
      WHERE q.keep
    ),
    seeds AS (
      SELECT doc_id, text FROM s2 ORDER BY doc_id LIMIT {_N_TRACERS}
    ),
    d3in AS (
      SELECT doc_id, text FROM s2
      UNION ALL
      SELECT doc_id + {_EX_OFF}, text FROM seeds
      UNION ALL
      SELECT doc_id + {_NR_OFF}, text || '{_NR_SUFFIX}' FROM seeds
    ),
    d3tok AS (
      SELECT doc_id, text, cast({_NTOK_SQL} AS BIGINT) AS n_tok FROM d3in
    ),
    fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
      FROM d3tok
    ),
    s3 AS (
      SELECT d3tok.* FROM d3tok
      JOIN (SELECT f, min(doc_id) AS keep_id FROM fp GROUP BY f) k
        ON d3tok.doc_id = k.keep_id
    ),
    t4 AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
      FROM s3
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      FROM t4, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS u(i)
    ),
    sizes AS (
      SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id
    ),
    shc AS (
      SELECT s.doc_id, s.shingle FROM sh s
      JOIN (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 1000) ok
        USING (shingle)
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM shc a JOIN shc b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE round(n_common / (sa.set_size + sb.set_size - n_common), 6)
            >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    closure AS (
      WITH RECURSIVE reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      )
      SELECT * FROM reach
    ),
    drop4 AS (
      SELECT src AS doc_id FROM closure
      GROUP BY src HAVING least(min(dst), src) <> src
    ),
    s4 AS (
      SELECT s3.* FROM s3
      WHERE doc_id NOT IN (SELECT doc_id FROM drop4)
    ),
    raw AS (SELECT cast(count(*) AS BIGINT) AS n FROM d)
    SELECT stage, stage_name, docs_kept, tokens_kept,
           floor(docs_kept * 1e6 / raw.n) / 1e6 AS pct_of_raw
    FROM (
      SELECT 0 AS stage, 'raw' AS stage_name,
             cast(count(*) AS BIGINT) AS docs_kept,
             cast(sum(n_tok) AS BIGINT) AS tokens_kept FROM d
      UNION ALL
      SELECT 1, 'lang_en', cast(count(*) AS BIGINT),
             cast(sum(n_tok) AS BIGINT) FROM s1
      UNION ALL
      SELECT 2, 'quality', cast(count(*) AS BIGINT),
             cast(sum(n_tok) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, 'exact_dedup', cast(count(*) AS BIGINT),
             cast(sum(n_tok) AS BIGINT) FROM s3
      UNION ALL
      SELECT 4, 'near_dup', cast(count(*) AS BIGINT),
             cast(sum(n_tok) AS BIGINT) FROM s4
    ) f, raw
"""


@query(
    "corpus_curation_funnel",
    oracle=_FUNNEL_ORACLE,
    tags=["text", "dedup", "quality", "lang-id", "llm-pipeline", "funnel"],
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly curation job as ONE plan — see module docstring. Every
    stage reuses the registered operator implementation (lang_id_
    prediction, gopher_quality_filter, fingerprint,
    ngram_jaccard_pairs_inverted, connected_components), so the funnel
    is a composition proof: the pieces the registry verifies one-by-one
    compose into the pipeline a user actually runs."""
    from ..catalog import fan_out_scan
    from ..operators.dedup import (
        connected_components,
        ngram_jaccard_pairs_inverted,
    )
    from .advanced import lang_score_exprs
    from .corpusqc import gopher_metric_exprs, gopher_rule_exprs

    ntok = F.size(tokens(F.col("text"))).cast("long")
    # r9 optimization: stages 0-2 are per-doc predicates, so instead of
    # joining the materialized lang-ID and Gopher queries onto the
    # corpus (each join re-scanned documents; the stage-1 row re-ran the
    # lang scan again, and raw_n was a fourth pass), the SAME expressions
    # those operators are built from (lang_is_en_expr / gopher_keep_expr
    # — shared builders, so the funnel cannot drift from the registered
    # operators) are evaluated scan-side in ONE fanned-out pass, and the
    # stage-0/1/2 funnel rows fold into ONE conditional aggregation.
    # A doc passes stage 1 iff its lang_id_prediction row says 'en' and
    # stage 2 iff its gopher_quality_filter row says keep — both are
    # one-row-per-doc projections, so join == filter, value-identical;
    # the oracle (which embeds the registered oracles as subqueries) is
    # unchanged.
    # Layered projections so each expensive tokenization / score is
    # materialized ONCE per row (higher-order array exprs are codegen-
    # fallback and do not share subexpressions; CollapseProject keeps a
    # layer whenever an aliased non-cheap expression is referenced more
    # than once above it). Values are identical by construction — the
    # pre-materialized columns hold exactly the subtrees the builders
    # would inline.
    base0 = fan_out_scan(T(spark, sf_dir, "documents")).select(
        "doc_id",
        "text",
        tokens(F.col("text")).alias("wsr"),
        tokens(F.lower(F.trim(F.col("text")))).alias("wsl"),
        F.split(F.col("text"), "\n").alias("lns"),
    )
    sc = lang_score_exprs(
        toks=F.col("wsl"),
        denom=F.greatest(F.size("wsr"), F.lit(1)),
    )
    me = gopher_metric_exprs(ws=F.col("wsr"), lines=F.col("lns"))
    scored = base0.select(
        "doc_id",
        "text",
        F.size("wsr").cast("long").alias("n_tok"),
        *[sc[lang].alias(f"s_{lang}") for lang in ("en", "de", "es", "fr")],
        *[me[k].alias(f"g_{k}") for k in me],
    )
    l1 = (
        (F.col("s_en") >= F.col("s_de"))
        & (F.col("s_en") >= F.col("s_es"))
        & (F.col("s_en") >= F.col("s_fr"))
    )
    q2 = None
    for cond in gopher_rule_exprs(
        {k: F.col(f"g_{k}") for k in me}
    ).values():
        q2 = cond if q2 is None else q2 & cond
    base = scored.select(
        "doc_id", "text", "n_tok", l1.alias("l1"), q2.alias("q2")
    )
    # The heavy flag pass runs ONCE into a NARROW checkpoint (doc_id +
    # n_tok + two booleans — no text); the stage-0/1/2 aggregates fold
    # into one conditional aggregation over it, and the stage-2 survivor
    # text re-attaches by doc_id join (decide with small rows, move the
    # heavy bytes once).
    flags = base.select("doc_id", "n_tok", "l1", "q2").localCheckpoint(
        eager=True
    )
    csum = lambda cond: F.coalesce(  # noqa: E731
        F.sum(F.when(cond, F.col("n_tok"))), F.lit(0)
    ).cast("long")
    ccnt = lambda cond: F.coalesce(  # noqa: E731
        F.sum(F.when(cond, F.lit(1))), F.lit(0)
    ).cast("long")
    sums = flags.agg(
        F.count(F.lit(1)).cast("long").alias("d0"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("t0"),
        ccnt(F.col("l1")).alias("d1"),
        csum(F.col("l1")).alias("t1"),
        ccnt(F.col("l1") & F.col("q2")).alias("d2"),
        csum(F.col("l1") & F.col("q2")).alias("t2"),
    )

    # multi-consumer survivor frame is materialized once (tracer seed,
    # dedup input, stage-3 anti-join) — the repo-wide re-execution gotcha
    s2 = (
        T(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .join(
            flags.filter(F.col("l1") & F.col("q2")).select(
                "doc_id", "n_tok"
            ),
            "doc_id",
        )
        .select("doc_id", "text", "n_tok")
        .localCheckpoint(eager=True)
    )

    seeds = s2.orderBy("doc_id").limit(_N_TRACERS).select("doc_id", "text")
    d3in = (
        s2.select("doc_id", "text")
        .unionByName(
            seeds.select((F.col("doc_id") + _EX_OFF).alias("doc_id"), "text")
        )
        .unionByName(
            seeds.select(
                (F.col("doc_id") + _NR_OFF).alias("doc_id"),
                F.concat(F.col("text"), F.lit(_NR_SUFFIX)).alias("text"),
            )
        )
        .select("doc_id", "text", ntok.alias("n_tok"))
    )
    fp = d3in.select("doc_id", fingerprint(F.col("text")).alias("f"))
    keepers = fp.groupBy("f").agg(F.min("doc_id").alias("doc_id"))
    s3 = d3in.join(keepers.select("doc_id"), "doc_id").localCheckpoint(
        eager=True
    )

    # r10 probe: a checkpointed shared shingle table for the dedup stage
    # was A/B'd (5.41 vs 4.93 s) and LOST — s3 is already a checkpointed
    # survivor table, so the second tokenize it saves is cheaper than
    # the extra materialization. Left as-is per the measure-first rule.
    pairs = ngram_jaccard_pairs_inverted(
        s3, "doc_id", "text", n=3, threshold=0.5, max_shingle_docs=1000
    )
    comp = connected_components(pairs)
    drop4 = (
        comp.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
    )
    s4 = s3.join(drop4, "doc_id", "left_anti")

    def row(stage: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.count(F.lit(1)).cast("long").alias("docs_kept"),
            F.coalesce(F.sum("n_tok"), F.lit(0))
            .cast("long")
            .alias("tokens_kept"),
        ).select(
            F.lit(stage).cast("long").alias("stage"),
            F.lit(name).alias("stage_name"),
            "docs_kept",
            "tokens_kept",
        )

    rows012 = sums.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(stage).cast("long").alias("stage"),
                        F.lit(name).alias("stage_name"),
                        F.col(f"d{stage}").alias("docs_kept"),
                        F.col(f"t{stage}").alias("tokens_kept"),
                    )
                    for stage, name in (
                        (0, "raw"),
                        (1, "lang_en"),
                        (2, "quality"),
                    )
                ]
            )
        ).alias("r")
    ).select("r.stage", "r.stage_name", "r.docs_kept", "r.tokens_kept")
    funnel = (
        rows012
        .unionByName(row(3, "exact_dedup", s3))
        .unionByName(row(4, "near_dup", s4))
    )
    raw_n = sums.select(F.col("d0").alias("raw_n"))
    return funnel.crossJoin(raw_n).select(
        "stage",
        "stage_name",
        "docs_kept",
        "tokens_kept",
        (F.floor(F.col("docs_kept") * 1e6 / F.col("raw_n")) / 1e6).alias(
            "pct_of_raw"
        ),
    )
