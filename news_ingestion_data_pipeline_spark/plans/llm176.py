"""Hundred-seventy-sixth wave: the SentencePiece EM M-step and the
length-controlled reward win rate — round-10 growth of the tokenizer and
RLHF-eval families.

* ``text_unigram_em_mstep`` completes the unigram-LM EM loop started by
  ``text_unigram_viterbi_segment`` (llm119, the E-step): the Viterbi DP
  is re-run with the chosen piece length carried in the encoded integer,
  the optimal segmentation is BACKTRACED relationally (a second exact-
  integer fold walking the positions array), and the piece table is
  re-estimated from the Viterbi piece counts — Kudo 2018's M-step
  (arXiv:1804.10959), the step SentencePiece alternates with Viterbi
  until the vocabulary converges.

* ``eval_lc_winrate`` is the length-controlled win rate — the
  AlpacaEval-LC idea (Dubois et al. 2024, arXiv:2404.04475): raw win
  rates reward verbosity, so compare two models ONLY within length-
  matched buckets and average the per-bucket rates with equal weight.
  Models A/B are a seeded md5 parity split of the labeled eval set, the
  per-bucket pairing is a seeded md5 rank alignment, and wins are
  counted in exact half-units (2 = win, 1 = tie, 0 = loss) over the
  influence family's deterministic reward model.

Both queries follow the registry's determinism discipline: every DP and
every count is exact integer arithmetic; the only doubles are the final
-log2 costs (the E-step's established nano-bit contract) and 6-dp
rounded rates of exact integer ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions.text import (
    normalize_text,
    tokens,
)
from news_ingestion_data_pipeline_spark.plans.llm119 import _VITERBI_CTES
from news_ingestion_data_pipeline_spark.plans.llm174 import (
    _G_SQL,
    _T_CHECKPOINTS,
    _g_frame,
)
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.tables import local_df

_MAXP = 4  # max piece length (must match llm119's E-step)

#: candidate encoding: value = cost_e9 * 128 + n_pieces * 8 + last_k.
#: least() is then lexicographic (cost, pieces, k) — the k tiebreak
#: makes the backtraced path UNIQUE even when several segmentations
#: share the optimal (cost, pieces), which the M-step needs (the
#: E-step's cost*16+pieces encoding reports identical costs but would
#: leave the piece identities ambiguous on ties).
_SENT = "10000000000000000"  # beats nothing: max valid encode < 2^47


def _m_enc_sql(k: int) -> str:
    prev = f"acc[e[1] - {k - 1}]" if k > 1 else "acc[e[1]]"
    core = (
        f"({prev} // 128 + cs[(e[1] - {k}) * {_MAXP} + {k}]) * 128"
        f" + (({prev} % 128) // 8 + 1) * 8 + {k}"
    )
    if k == 1:
        return core
    return f"CASE WHEN e[1] >= {k} THEN {core} ELSE {_SENT} END"


@register(
    "text_unigram_em_mstep",
    oracle=f"""
WITH words AS (
  SELECT term AS w, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(
      regexp_split_to_array({SQL_NORM.format(col='text')}, '\\s+'),
      _t -> _t <> '')) AS term
    FROM documents
  ) GROUP BY term
),
grid AS (
  SELECT w, freq, length(w) AS L, s.start, k.k,
         substr(w, s.start + 1, k.k) AS piece
  FROM words,
       LATERAL (SELECT unnest(range(0, length(w))) AS start) s,
       LATERAL (SELECT unnest(range(1, {_MAXP} + 1)) AS k) k
  WHERE s.start + k.k <= length(w)
),
vocab AS (
  SELECT piece, SUM(freq) AS cnt FROM grid GROUP BY piece
),
tot AS (
  SELECT SUM(cnt) AS n_total, COUNT(*) AS v FROM vocab
),
costs AS (
  SELECT vocab.piece,
         CAST(round(-log2((vocab.cnt + 1.0) / (tot.n_total + tot.v))
                    * 1000000000.0) AS BIGINT) AS c_e9
  FROM vocab, tot
),
cell AS (
  SELECT g.w, g.freq, g.L, g.start * {_MAXP} + g.k AS idx, c.c_e9
  FROM grid g JOIN costs c ON c.piece = g.piece
),
full_grid AS (
  SELECT w, freq, length(w) AS L, s.start * {_MAXP} + k.k AS idx
  FROM words,
       LATERAL (SELECT unnest(range(0, length(w))) AS start) s,
       LATERAL (SELECT unnest(range(1, {_MAXP} + 1)) AS k) k
),
ca AS (
  SELECT fg.w, MAX(fg.freq) AS freq, MAX(fg.L) AS L,
         array_agg(COALESCE(cell.c_e9, 1000000000000000) ORDER BY fg.idx)
           AS cs
  FROM full_grid fg
  LEFT JOIN cell ON cell.w = fg.w AND cell.idx = fg.idx
  GROUP BY fg.w
),
folded AS (
  SELECT w, freq, L,
    list_reduce(
      list_prepend([CAST(0 AS BIGINT)],
        list_transform(range(1, L + 1), j -> [CAST(j AS BIGINT)])),
      (acc, e) -> list_append(acc,
        least({", ".join(_m_enc_sql(k) for k in range(1, _MAXP + 1))}))
    ) AS dp
  FROM ca
),
back AS (
  SELECT w, freq, L,
    list_reduce(
      list_prepend([CAST(L AS BIGINT)],
        list_transform(range(1, L + 1), j -> [CAST(j AS BIGINT)])),
      (acc, e) -> list_append(acc,
        CASE WHEN acc[len(acc)] > 0
             THEN acc[len(acc)] - dp[acc[len(acc)] + 1] % 8
             ELSE -1 END)
    ) AS pos
  FROM folded
),
pieces AS (
  SELECT substr(b.w, CAST(b.pos[i.i + 1] + 1 AS INT),
                CAST(b.pos[i.i] - b.pos[i.i + 1] AS INT)) AS piece,
         b.freq
  FROM back b, LATERAL (SELECT unnest(range(1, b.L + 1)) AS i) i
  WHERE b.pos[i.i] > 0 AND b.pos[i.i + 1] >= 0
),
used AS (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS e_cnt
  FROM pieces GROUP BY piece
),
etot AS (
  SELECT CAST(SUM(e_cnt) AS BIGINT) AS s FROM used
),
newc AS (
  SELECT u.piece, u.e_cnt, c.c_e9 AS old_cost_e9,
         CAST(round(-log2(CAST(u.e_cnt AS DOUBLE) / etot.s)
                    * 1000000000.0) AS BIGINT) AS new_cost_e9
  FROM used u JOIN costs c ON c.piece = u.piece CROSS JOIN etot
)
SELECT piece, e_cnt, old_cost_e9, new_cost_e9,
       new_cost_e9 - old_cost_e9 AS delta_e9
FROM newc
""",
    description="SentencePiece unigram-LM EM M-STEP (Kudo 2018, the "
    "counterpart of text_unigram_viterbi_segment's E-step): the Viterbi "
    "DP re-runs with the chosen piece length k carried in the encoded "
    "BIGINT (cost*128 + pieces*8 + k, so least() is lexicographic "
    "(cost, pieces, k) and the optimal path is UNIQUE even on ties), a "
    "second exact-integer fold backtraces the positions array, and the "
    "piece probabilities are re-estimated from the freq-weighted "
    "Viterbi piece counts — new cost -log2(count/total) in nano-bits "
    "beside the E-step's add-one prior cost, delta_e9 = how far one EM "
    "round moved each piece. Pieces the Viterbi never uses drop out "
    "(SentencePiece's pruning). Determinism: both folds are pure BIGINT "
    "arithmetic replayed verbatim by the oracle's list_reduce; the only "
    "doubles are the two -log2 nano-bit costs (the E-step's established "
    "libm contract). Scale shape: the DP and backtrace run per DISTINCT "
    "word (vocabulary-sized, not corpus-sized); corpus-scale work is "
    "the word count, then one (word, piece) shuffle and one piece-keyed "
    "re-aggregation — EM iterates by repeating this stage with "
    "new_cost_e9 as the cost table.",
    tags=("text", "llm", "iterative"),
)
def text_unigram_em_mstep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.plans.llm119 import (
        corpus_word_counts,
    )

    # pinned: the corpus tokenize+count pass is the ONLY corpus-scale
    # work; everything below is vocabulary-sized and multiply consumed
    # (unpinned, the pass re-ran once per consumer subtree — r11 profile)
    words = corpus_word_counts(spark, sf_dir)
    base = words.select("w", "freq", F.length("w").alias("L"))
    grid = base.select(
        "w",
        "freq",
        "L",
        F.explode(F.sequence(F.lit(0), F.col("L") - 1)).alias("start"),
    ).select(
        "w",
        "freq",
        "L",
        "start",
        F.explode(F.sequence(F.lit(1), F.lit(_MAXP))).alias("k"),
    )
    pieces = grid.filter(F.col("start") + F.col("k") <= F.col("L")).select(
        "w",
        "freq",
        "L",
        "start",
        "k",
        F.expr("substr(w, start + 1, k)").alias("piece"),
    )
    vocab = pieces.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    tot = vocab.agg(
        F.sum("cnt").alias("n_total"), F.count(F.lit(1)).alias("v")
    )
    costs = vocab.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.round(
            -F.log2(
                (F.col("cnt") + 1.0) / (F.col("n_total") + F.col("v"))
            )
            * 1000000000.0
        )
        .cast("bigint")
        .alias("c_e9"),
    )
    # one grid pass: the FULL (start, k) grid carries its piece only where
    # start + k <= L (NULL otherwise); a single left join against the
    # broadcast cost table + coalesce yields cs arrays bit-identical to
    # the former full_grid LEFT JOIN cell form (see llm119._viterbi_ca)
    cell = grid.select(
        "w",
        "freq",
        "L",
        (F.col("start") * _MAXP + F.col("k")).alias("idx"),
        F.when(
            F.col("start") + F.col("k") <= F.col("L"),
            F.expr("substr(w, start + 1, k)"),
        ).alias("piece"),
    ).join(F.broadcast(costs), "piece", "left")
    ca = (
        cell.groupBy("w")
        .agg(
            F.max("freq").alias("freq"),
            F.max("L").alias("L"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "idx",
                            F.coalesce(
                                "c_e9", F.lit(1000000000000000)
                            ).alias("c"),
                        )
                    )
                ),
                lambda s: s["c"],
            ).alias("cs"),
        )
    )

    big = F.lit(1 << 55).cast("bigint")

    def step(acc, j):
        # encoded candidate for a piece of length k ending at position j:
        # ((prev_cost + piece_cost) << 7) + ((prev_pieces + 1) << 3) + k,
        # all exact bit arithmetic (see llm119's E-step; here k rides
        # the low 3 bits so the min also fixes the backpointer).
        def enc(k):
            prev = F.element_at(acc, (j - (k - 1)).cast("int"))
            cost = F.element_at("cs", ((j - k) * _MAXP + k).cast("int"))
            return (
                F.shiftleft(F.shiftright(prev, 7) + cost, 7)
                + F.shiftleft(
                    F.shiftright(prev, 3).bitwiseAND(F.lit(15)) + 1, 3
                )
                + k
            )

        cands = [enc(1)]
        for k in (2, 3, 4):
            cands.append(F.when(j >= k, enc(k)).otherwise(big))
        return F.concat(acc, F.array(F.least(*cands)))

    folded = ca.select(
        "w",
        "freq",
        "L",
        F.aggregate(
            F.sequence(F.lit(1), F.col("L")),
            F.array(F.lit(0).cast("bigint")),
            step,
        ).alias("dp"),
    )

    def bstep(acc, _j):
        last = F.element_at(acc, F.size(acc))
        nxt = F.when(
            last > 0,
            last - F.element_at("dp", (last + 1).cast("int")) % 8,
        ).otherwise(F.lit(-1).cast("bigint"))
        return F.concat(acc, F.array(nxt))

    back = folded.select(
        "w",
        "freq",
        F.aggregate(
            F.sequence(F.lit(1), F.col("L")),
            F.array(F.col("L").cast("bigint")),
            bstep,
        ).alias("pos"),
        "L",
    )
    segs = (
        back.select(
            "w",
            "freq",
            F.explode(F.sequence(F.lit(1), F.col("L"))).alias("i"),
            "pos",
        )
        .select(
            "w",
            "freq",
            F.element_at("pos", F.col("i").cast("int")).alias("a"),
            F.element_at("pos", (F.col("i") + 1).cast("int")).alias("b"),
        )
        .filter((F.col("a") > 0) & (F.col("b") >= 0))
        .select(
            F.expr("substr(w, CAST(b + 1 AS INT), CAST(a - b AS INT))")
            .alias("piece"),
            "freq",
        )
    )
    used = segs.groupBy("piece").agg(
        F.sum("freq").cast("bigint").alias("e_cnt")
    )
    etot = used.agg(F.sum("e_cnt").cast("bigint").alias("s"))
    new_cost = (
        F.round(
            -F.log2(F.col("e_cnt").cast("double") / F.col("s"))
            * 1000000000.0
        )
        .cast("bigint")
        .alias("new_cost_e9")
    )
    return (
        used.join(F.broadcast(costs), "piece")
        .crossJoin(F.broadcast(etot))
        .select(
            "piece",
            "e_cnt",
            F.col("c_e9").alias("old_cost_e9"),
            new_cost,
        )
        .select(
            "piece",
            "e_cnt",
            "old_cost_e9",
            "new_cost_e9",
            (F.col("new_cost_e9") - F.col("old_cost_e9")).alias("delta_e9"),
        )
    )


@register(
    "eval_lc_winrate",
    oracle=f"""
WITH {_G_SQL},
pp AS (
  SELECT g.vec_id, round(g.g + e.y, 9) AS p
  FROM g JOIN e ON e.vec_id = g.vec_id
  WHERE g.t = {_T_CHECKPOINTS}
),
j AS (
  SELECT d.doc_id,
         CAST(CAST(pp.p AS DECIMAL(18,9)) * 1000000000 AS BIGINT) AS pn,
         CAST(round(d.n_chars, -2) AS BIGINT) AS len_bucket,
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':lc'),
                             1, 15) AS BIGINT) % 2 AS m,
         md5(CAST(d.doc_id AS VARCHAR) || ':pair') AS h
  FROM pp JOIN documents d ON d.doc_id = pp.vec_id
),
ranked AS (
  SELECT len_bucket, m, pn,
         ROW_NUMBER() OVER (PARTITION BY len_bucket, m
                            ORDER BY h, doc_id) AS r
  FROM j
),
pairs AS (
  SELECT a.len_bucket,
         CASE WHEN a.pn > b.pn THEN 2
              WHEN a.pn = b.pn THEN 1
              ELSE 0 END AS wa2
  FROM ranked a JOIN ranked b
    ON b.len_bucket = a.len_bucket AND b.r = a.r
  WHERE a.m = 0 AND b.m = 1
),
per AS (
  SELECT len_bucket,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(wa2) AS BIGINT) AS wins_a_x2
  FROM pairs GROUP BY len_bucket
),
consts AS (
  SELECT round(CAST(CAST(SUM(CAST(round(wins_a_x2 / (2.0 * n_pairs), 12)
                                  AS DECIMAL(24,12))) AS VARCHAR)
                    AS DOUBLE) / COUNT(*), 6) AS lc_winrate_a,
         round(CAST(SUM(wins_a_x2) AS DOUBLE) / (2.0 * SUM(n_pairs)), 6)
           AS raw_winrate_a
  FROM per
)
SELECT per.len_bucket, per.n_pairs, per.wins_a_x2,
       round(per.wins_a_x2 / (2.0 * per.n_pairs), 6) AS win_rate_a,
       consts.lc_winrate_a, consts.raw_winrate_a
FROM per CROSS JOIN consts
""",
    description="Length-controlled win rate — the AlpacaEval-LC "
    "debiasing (Dubois et al. 2024): raw pairwise win rates reward "
    "verbosity (see eval_reward_length_bias's correlation audit), so "
    "models are compared ONLY within 100-char length buckets and the "
    "per-bucket rates are averaged with EQUAL weight — the LC rate "
    "moves only when a model wins at matched length, not when it pads. "
    "Models A/B are a seeded md5 parity split of the labeled eval set; "
    "within each (bucket, model) the pairing is a seeded md5 rank "
    "alignment (ROW_NUMBER over the pair-salt hash, unmatched tail "
    "dropped by the inner join); the judge is the influence family's "
    "deterministic reward model with scores compared as exact integer "
    "NANOS (the events_dpo_pairs discipline). Wins count in half-units "
    "(2/1/0 for win/tie/loss) so every rate is an exact-integer ratio. "
    "Output: per-bucket n_pairs, wins, win rate, plus the LC and raw "
    "overall rates as constant audit columns — LC far from raw IS the "
    "length-bias diagnosis. Shape: the g pipeline, one rank window "
    "partitioned by (bucket, model) over the EVAL-SET-sized frame (not "
    "the corpus), one (bucket, rank) equi-join, one bucket aggregate; "
    "the 1-row consts frame is a broadcast cross join.",
    tags=("eval", "llm", "stats", "preference"),
)
def eval_lc_winrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, g = _g_frame(spark, sf_dir)
    pp = (
        g.filter(F.col("t") == _T_CHECKPOINTS)
        .join(emb.select("vec_id", "y"), "vec_id")
        .select("vec_id", F.round(F.col("g") + F.col("y"), 9).alias("p"))
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = pp.join(docs, pp["vec_id"] == docs["doc_id"]).select(
        "doc_id",
        (F.col("p").cast("decimal(18,9)") * 1000000000)
        .cast("bigint")
        .alias("pn"),
        F.round("n_chars", -2).cast("bigint").alias("len_bucket"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"), F.lit(":lc")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("m"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":pair"))
        ).alias("h"),
    )
    wr = Window.partitionBy("len_bucket", "m").orderBy("h", "doc_id")
    ranked = j.select(
        "len_bucket", "m", "pn", F.row_number().over(wr).alias("r")
    )
    # pair the two arms with ONE aggregate on (len_bucket, r) instead of
    # an m=0/m=1 filter self-join: (len_bucket, m, r) is unique by
    # row_number, so max-over-singleton reproduces each arm's pn and the
    # both-present filter IS the former inner join's row set — the ranked
    # window pipeline (g-frame join + md5s + window) now runs once, not
    # once per join branch (r11 profile: two byte-identical 32-task map
    # stages, 278K/254K exchanges).
    per = (
        ranked.groupBy("len_bucket", "r")
        .agg(
            F.max(F.when(F.col("m") == 0, F.col("pn"))).alias("pa"),
            F.max(F.when(F.col("m") == 1, F.col("pn"))).alias("pb"),
            # presence flags, not pn-nullness, decide whether a pair
            # exists: pn is non-null by construction today, but if that
            # ever changed, filtering on pa/pb would silently DROP the
            # pair where the former inner join kept it and scored the
            # NULL comparison as a loss for arm a (otherwise(0) below).
            F.max(F.col("m") == 0).alias("ha"),
            F.max(F.col("m") == 1).alias("hb"),
        )
        .filter(F.col("ha") & F.col("hb"))
        .select(
            "len_bucket",
            F.when(F.col("pa") > F.col("pb"), 2)
            .when(F.col("pa") == F.col("pb"), 1)
            .otherwise(0)
            .alias("wa2"),
        )
        .groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("wa2").cast("bigint").alias("wins_a_x2"),
        )
    )
    consts = per.agg(
        F.round(
            F.sum(
                F.round(
                    F.col("wins_a_x2") / (F.lit(2.0) * F.col("n_pairs")),
                    12,
                ).cast("decimal(24,12)")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("lc_winrate_a"),
        F.round(
            F.sum("wins_a_x2").cast("double")
            / (F.lit(2.0) * F.sum("n_pairs")),
            6,
        ).alias("raw_winrate_a"),
    )
    return per.crossJoin(F.broadcast(consts)).select(
        "len_bucket",
        "n_pairs",
        "wins_a_x2",
        F.round(
            F.col("wins_a_x2") / (F.lit(2.0) * F.col("n_pairs")), 6
        ).alias("win_rate_a"),
        "lc_winrate_a",
        "raw_winrate_a",
    )


@register(
    "text_tokenizer_fertility",
    oracle=f"""{_VITERBI_CTES},
seg AS (
  SELECT w, L,
         CAST(dp[L + 1] // 16 AS BIGINT) AS cost_e9,
         CAST(dp[L + 1] % 16 AS BIGINT) AS np
  FROM folded
),
lw AS (
  SELECT lang, term AS w, COUNT(*) AS freq FROM (
    SELECT lang, unnest(list_filter(
      regexp_split_to_array({SQL_NORM.format(col='text')}, '\\s+'),
      _t -> _t <> '')) AS term
    FROM documents
  ) GROUP BY lang, term
)
SELECT lw.lang,
       CAST(SUM(lw.freq) AS BIGINT) AS n_tokens,
       CAST(SUM(lw.freq * seg.np) AS BIGINT) AS n_pieces,
       CAST(SUM(lw.freq * seg.L) AS BIGINT) AS n_chars,
       round(CAST(SUM(lw.freq * seg.np) AS DOUBLE) / SUM(lw.freq), 6)
         AS fertility,
       round(CAST(SUM(lw.freq * seg.L) AS DOUBLE)
             / SUM(lw.freq * seg.np), 6) AS chars_per_piece,
       round(CAST(SUM(lw.freq * seg.cost_e9) AS DOUBLE) / 1000000000.0
             / SUM(lw.freq * seg.L), 6) AS bits_per_char
FROM lw JOIN seg ON seg.w = lw.w
GROUP BY lw.lang
""",
    description="Per-language tokenizer PARITY eval over the unigram-LM "
    "Viterbi segmentation (the standard multilingual-tokenizer audit: "
    "fertility premiums mean some languages pay more pieces — and so "
    "more compute and context — per word): per lang, total tokens, "
    "Viterbi pieces, chars, FERTILITY (pieces/token), chars-per-piece, "
    "and bits-per-char (the unigram LM's compression rate, from the "
    "DP's exact nano-bit costs). The DP replay is llm119's E-step "
    "verbatim (shared oracle CTE chain); per-(lang, word) counts join "
    "the vocabulary-sized segmentation table. Determinism: every SUM "
    "is exact BIGINT (freq x {{pieces, chars, cost_e9}}); the only "
    "doubles are three final 6-dp-rounded ratios. Shape: one corpus "
    "(lang, word) count, the vocabulary-sized DP, one word-keyed join, "
    "one per-lang aggregate — no windows, no collects.",
    tags=("text", "llm", "eval"),
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.plans.llm119 import (
        viterbi_folded,
    )
    from news_ingestion_data_pipeline_spark.tables import spread

    # ONE corpus pass: the pinned (lang, word) count is the only
    # corpus-scale work; the unweighted word table the Viterbi DP needs
    # is its per-word re-aggregate (sum of per-lang counts = the corpus
    # count, exact integers), so the DP replays llm119's E-step verbatim
    # without a second tokenize pass (previously three corpus map stages:
    # two from the unpinned viterbi words + this count — r11 profile).
    lw = (
        spread(t(spark, sf_dir, "documents"))
        .select(
            "lang",
            F.explode(tokens(normalize_text(F.col("text")))).alias("w"),
        )
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint()
    )
    words = lw.groupBy("w").agg(F.sum("freq").alias("freq"))
    folded = viterbi_folded(words)
    last = F.element_at("dp", (F.col("L") + 1).cast("int"))
    seg = folded.select(
        "w",
        "L",
        F.expr(
            "CAST(element_at(dp, CAST(L + 1 AS INT)) div 16 AS BIGINT)"
        ).alias("cost_e9"),
        (last % 16).cast("bigint").alias("np"),
    )
    return (
        lw.join(seg, "w")
        .groupBy("lang")
        .agg(
            F.sum("freq").cast("bigint").alias("n_tokens"),
            F.sum(F.col("freq") * F.col("np")).cast("bigint").alias("n_pieces"),
            F.sum(F.col("freq") * F.col("L")).cast("bigint").alias("n_chars"),
            F.round(
                F.sum(F.col("freq") * F.col("np")).cast("double")
                / F.sum("freq"),
                6,
            ).alias("fertility"),
            F.round(
                F.sum(F.col("freq") * F.col("L")).cast("double")
                / F.sum(F.col("freq") * F.col("np")),
                6,
            ).alias("chars_per_piece"),
            F.round(
                F.sum(F.col("freq") * F.col("cost_e9")).cast("double")
                / F.lit(1000000000.0)
                / F.sum(F.col("freq") * F.col("L")),
                6,
            ).alias("bits_per_char"),
        )
    )


@register(
    "events_kto_labels",
    oracle="""
WITH per AS (
  SELECT user_id, event_type,
         SUM(CAST(value AS DECIMAL(20,10))) AS sv
  FROM events GROUP BY user_id, event_type
),
e10 AS (
  SELECT user_id, event_type,
         CAST(sv * 10000000000 AS BIGINT) AS sv_e10
  FROM per
),
u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(sv_e10) AS BIGINT) AS tot_e10
  FROM e10 GROUP BY user_id
),
lab AS (
  SELECT e.user_id, e.event_type AS completion,
         e.sv_e10 * u.c - u.tot_e10 AS margin_e10,
         CASE WHEN e.sv_e10 * u.c - u.tot_e10 > 0 THEN 'desirable'
              ELSE 'undesirable' END AS label
  FROM e10 e JOIN u ON u.user_id = e.user_id
  WHERE e.sv_e10 * u.c - u.tot_e10 <> 0
),
consts AS (
  SELECT CAST(COUNT(*) FILTER (WHERE label = 'desirable') AS BIGINT)
           AS n_desirable,
         CAST(COUNT(*) FILTER (WHERE label = 'undesirable') AS BIGINT)
           AS n_undesirable,
         CASE WHEN COUNT(*) FILTER (WHERE label = 'desirable') > 0
              THEN round(
                CAST(COUNT(*) FILTER (WHERE label = 'undesirable')
                     AS DOUBLE)
                / COUNT(*) FILTER (WHERE label = 'desirable'), 6)
              ELSE NULL END AS w_desirable
  FROM lab
)
SELECT lab.user_id, lab.completion, lab.label, lab.margin_e10,
       consts.n_desirable, consts.n_undesirable, consts.w_desirable
FROM lab CROSS JOIN consts
""",
    description="KTO binary-preference label construction (Ethayarajh "
    "et al. 2024, 'KTO: Model Alignment as Prospect Theoretic "
    "Optimization' — the pointwise alternative to DPO's pairs: each "
    "completion is simply DESIRABLE or UNDESIRABLE relative to a "
    "reference point): per user, each event type's spend is labeled "
    "against the user's own mean spend (the reference), exact ties "
    "dropped. The comparison is sv*c - sum(sv) in exact integer "
    "TENTH-NANOS (sign-equivalent to sv > mean with NO division, the "
    "events_dpo_pairs integer-margin discipline), emitted as "
    "margin_e10. Global class counts and the KTO class-balance weight "
    "lambda ratio (n_undesirable / n_desirable, the paper's "
    "lambda_D*n_D ~ lambda_U*n_U prescription) ride every row as "
    "constant audit columns. Shape: one (user, type) aggregate, one "
    "per-user aggregate, one user-keyed join — margins never leave "
    "integer arithmetic; the 1-row consts frame is a broadcast cross "
    "join.",
    tags=("events", "llm", "preference", "curation"),
)
def events_kto_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(20,10)")).alias("sv"))
    )
    e10 = per.select(
        "user_id",
        "event_type",
        (F.col("sv") * 10000000000).cast("bigint").alias("sv_e10"),
    )
    u = e10.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("sv_e10").cast("bigint").alias("tot_e10"),
    )
    margin = F.col("sv_e10") * F.col("c") - F.col("tot_e10")
    lab = (
        e10.join(u, "user_id")
        .select(
            "user_id",
            F.col("event_type").alias("completion"),
            margin.alias("margin_e10"),
            F.when(margin > 0, "desirable")
            .otherwise("undesirable")
            .alias("label"),
        )
        .filter(F.col("margin_e10") != 0)
    )
    n_d = F.count(F.when(F.col("label") == "desirable", 1))
    n_u = F.count(F.when(F.col("label") == "undesirable", 1))
    consts = lab.agg(
        n_d.cast("bigint").alias("n_desirable"),
        n_u.cast("bigint").alias("n_undesirable"),
        F.when(
            n_d > 0, F.round(n_u.cast("double") / n_d, 6)
        ).alias("w_desirable"),
    )
    return lab.crossJoin(F.broadcast(consts)).select(
        "user_id",
        "completion",
        "label",
        "margin_e10",
        "n_desirable",
        "n_undesirable",
        "w_desirable",
    )


from news_ingestion_data_pipeline_spark.plans.llm175 import _WZ  # noqa: E402

#: literal form for the oracle f-string — repr round-trips the exact
#: double, so both engines square/multiply the identical z
_WZ_LIT = repr(_WZ)


@register(
    "eval_judge_position_bias",
    oracle=f"""
WITH per AS (
  SELECT user_id, event_type,
         SUM(CAST(value AS DECIMAL(20,10))) AS sv
  FROM events GROUP BY user_id, event_type
),
duels AS (
  SELECT a.user_id, a.event_type AS winner, b.event_type AS loser
  FROM per a JOIN per b
    ON b.user_id = a.user_id AND a.event_type != b.event_type
  WHERE a.sv > b.sv
),
pos AS (
  SELECT CASE WHEN CAST('0x' || substr(md5(
                CAST(user_id AS VARCHAR) || '|' || winner || '|' || loser
                || ':pos'), 1, 15) AS BIGINT) % 2 = 0
              THEN 1 ELSE 0 END AS first_win
  FROM duels
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_duels,
         CAST(SUM(first_win) AS BIGINT) AS first_wins
  FROM pos
),
wil AS (
  SELECT n_duels, first_wins,
         CAST(first_wins AS DOUBLE) / n_duels AS p,
         {_WZ_LIT} AS z
  FROM agg
)
SELECT n_duels, first_wins,
       round(p, 6) AS first_win_rate,
       round((p + z*z/(2*n_duels)
              - z * sqrt(p*(1-p)/n_duels + z*z/(4.0*n_duels*n_duels)))
             / (1 + z*z/n_duels), 6) AS wilson_lower,
       round((p + z*z/(2*n_duels)
              + z * sqrt(p*(1-p)/n_duels + z*z/(4.0*n_duels*n_duels)))
             / (1 + z*z/n_duels), 6) AS wilson_upper,
       CASE WHEN (p + z*z/(2*n_duels)
                  - z * sqrt(p*(1-p)/n_duels + z*z/(4.0*n_duels*n_duels)))
                 / (1 + z*z/n_duels) > 0.5 THEN 'first_biased'
            WHEN (p + z*z/(2*n_duels)
                  + z * sqrt(p*(1-p)/n_duels + z*z/(4.0*n_duels*n_duels)))
                 / (1 + z*z/n_duels) < 0.5 THEN 'second_biased'
            ELSE 'unbiased' END AS verdict
FROM wil
""",
    description="POSITION-BIAS audit for pairwise judging — the "
    "standard LLM-as-judge QA check (judges systematically prefer the "
    "first-presented response; e.g. Zheng et al. 2023, 'Judging "
    "LLM-as-a-Judge'): each duel's presentation order is a seeded md5 "
    "coin on (user, winner, loser), and the audit reports the rate at "
    "which the FIRST-presented item won, with its 95% Wilson interval "
    "— verdict 'first_biased'/'second_biased' only when the interval "
    "clears 0.5. Under the synthetic random-order assignment the rate "
    "must straddle 0.5, making this the harness's own null-calibration "
    "check as well as the reusable audit shape (swap the coin for a "
    "real presentation-order column and nothing else changes). "
    "Determinism: duel counts exact integers, the coin is the md5 "
    "parity idiom, sqrt is IEEE correctly-rounded. Shape: one "
    "within-user self-join then a single global aggregate — a 1-row "
    "result forever.",
    tags=("eval", "events", "preference", "stats"),
)
def eval_judge_position_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(20,10)")).alias("sv"))
    )
    a, b = per.alias("a"), per.alias("b")
    duels = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") != F.col("b.event_type"))
        & (F.col("a.sv") > F.col("b.sv")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_type").alias("winner"),
        F.col("b.event_type").alias("loser"),
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("|"),
                        F.col("winner"),
                        F.lit("|"),
                        F.col("loser"),
                        F.lit(":pos"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    agg = duels.select(
        F.when(coin == 0, 1).otherwise(0).alias("first_win")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_duels"),
        F.sum("first_win").cast("bigint").alias("first_wins"),
    )
    n = F.col("n_duels").cast("double")
    p = F.col("first_wins").cast("double") / F.col("n_duels")
    z = F.lit(_WZ)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    lower = (p + z * z / (2 * n) - half) / denom
    upper = (p + z * z / (2 * n) + half) / denom
    return agg.select(
        "n_duels",
        "first_wins",
        F.round(p, 6).alias("first_win_rate"),
        F.round(lower, 6).alias("wilson_lower"),
        F.round(upper, 6).alias("wilson_upper"),
        F.when(lower > 0.5, "first_biased")
        .when(upper < 0.5, "second_biased")
        .otherwise("unbiased")
        .alias("verdict"),
    )


@register(
    "curation_sampling_temperature",
    oracle=f"""
WITH lc AS (
  SELECT lang,
         CAST(SUM(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t, COUNT(*) AS nl FROM lc
),
scaled AS (
  SELECT lc.lang, lc.n_tokens,
         CAST(lc.n_tokens AS DOUBLE) / tot.t AS raw_share,
         round(sqrt(CAST(lc.n_tokens AS DOUBLE) / tot.t), 12) AS s
  FROM lc CROSS JOIN tot
),
z AS (
  SELECT CAST(CAST(SUM(CAST(s AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE)
           AS zsum
  FROM scaled
)
SELECT sc.lang, sc.n_tokens,
       round(sc.raw_share, 6) AS raw_share,
       round(sc.s / z.zsum, 6) AS sampled_share,
       round(sc.s / z.zsum / sc.raw_share, 6) AS upsample_factor
FROM scaled sc CROSS JOIN z
""",
    description="Temperature-scaled multilingual sampling mix — the "
    "standard low-resource rebalance (mBERT/XLM-R exponent-smoothed "
    "sampling, p_l^alpha renormalized; Conneau & Lample 2019) at "
    "alpha = 0.5, chosen deliberately because p^0.5 = sqrt(p) is the "
    "ONE power libm rounds correctly — the scaled shares are "
    "bit-identical in both engines with no pow() contract needed. Per "
    "language: the corpus token estimate (ceil(chars/4), the "
    "curation_token_estimate heuristic), raw share, the "
    "sqrt-temperature share renormalized over a 12-dp decimal fold, "
    "and the upsample factor (>1 = low-resource language oversampled, "
    "the entire point of temperature sampling). Shape: one per-lang "
    "aggregate and two 1-row broadcast cross joins — language-count-"
    "sized forever.",
    tags=("curation", "llm", "text"),
)
def curation_sampling_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lc = (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.sum(F.ceil(F.col("n_chars") / 4.0).cast("bigint"))
            .cast("bigint")
            .alias("n_tokens")
        )
    )
    tot = lc.agg(
        F.sum("n_tokens").cast("bigint").alias("t"),
        F.count(F.lit(1)).alias("nl"),
    )
    scaled = lc.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("t")).alias("raw_share"),
        F.round(
            F.sqrt(F.col("n_tokens").cast("double") / F.col("t")), 12
        ).alias("s"),
    )
    z = scaled.agg(
        F.sum(F.col("s").cast("decimal(24,12)"))
        .cast("double")
        .alias("zsum")
    )
    return scaled.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_tokens",
        F.round("raw_share", 6).alias("raw_share"),
        F.round(F.col("s") / F.col("zsum"), 6).alias("sampled_share"),
        F.round(
            F.col("s") / F.col("zsum") / F.col("raw_share"), 6
        ).alias("upsample_factor"),
    )


@register(
    "eval_distinct_ngrams",
    oracle=f"""
WITH toks AS (
  SELECT source, doc_id, generate_subscripts(v, 1) AS pos, unnest(v) AS w
  FROM (
    SELECT source, doc_id,
           list_filter(regexp_split_to_array(
             {SQL_NORM.format(col='text')}, '\\s+'), _t -> _t <> '') AS v
    FROM documents
  )
),
uni AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_unigrams,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS d_unigrams
  FROM toks GROUP BY source
),
bi AS (
  SELECT a.source,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(COUNT(DISTINCT a.w || ' ' || b.w) AS BIGINT) AS d_bigrams
  FROM toks a JOIN toks b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       AND b.source = a.source
  GROUP BY a.source
)
SELECT uni.source, uni.n_unigrams, uni.d_unigrams,
       bi.n_bigrams, bi.d_bigrams,
       round(CAST(uni.d_unigrams AS DOUBLE) / uni.n_unigrams, 6)
         AS distinct_1,
       round(CAST(bi.d_bigrams AS DOUBLE) / bi.n_bigrams, 6)
         AS distinct_2
FROM uni JOIN bi ON bi.source = uni.source
""",
    description="Distinct-n GENERATION-DIVERSITY eval (Li et al. 2016, "
    "'A Diversity-Promoting Objective Function' — distinct-1/distinct-2 "
    "are THE standard degenerate-repetition metrics for sampled "
    "generations): per source (each source standing for one "
    "generator), the unique-to-total ratio of unigrams and of "
    "within-document bigrams. A collapsing sampler (mode collapse, "
    "greedy loops) drives these toward 0; diverse sampling holds them "
    "up. Determinism: all counts are exact integers over the shared "
    "normalize+split token pipeline; the two 6-dp ratios are the only "
    "doubles. Shape: one corpus tokenize, a per-source distinct "
    "aggregate, and a position-offset self-join for bigrams (shuffle on "
    "doc_id) — two shuffles at any SF.",
    tags=("eval", "text", "llm"),
)
def eval_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        t(spark, sf_dir, "documents")
        .select(
            "source",
            "doc_id",
            F.posexplode(tokens(normalize_text(F.col("text")))).alias(
                "pos", "w"
            ),
        )
        # DuckDB generate_subscripts is 1-based; posexplode is 0-based —
        # align so the bigram offset join matches positions identically
        .select(
            "source", "doc_id", (F.col("pos") + 1).alias("pos"), "w"
        )
    )
    uni = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unigrams"),
        F.countDistinct("w").cast("bigint").alias("d_unigrams"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    bi = (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1)
            & (F.col("b.source") == F.col("a.source")),
        )
        .select(
            F.col("a.source").alias("source"),
            F.concat(F.col("a.w"), F.lit(" "), F.col("b.w")).alias("bg"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.countDistinct("bg").cast("bigint").alias("d_bigrams"),
        )
    )
    return uni.join(bi, "source").select(
        "source",
        "n_unigrams",
        "d_unigrams",
        "n_bigrams",
        "d_bigrams",
        F.round(
            F.col("d_unigrams").cast("double") / F.col("n_unigrams"), 6
        ).alias("distinct_1"),
        F.round(
            F.col("d_bigrams").cast("double") / F.col("n_bigrams"), 6
        ).alias("distinct_2"),
    )


#: model-size grid (params) for the token-budget allocation report
_CHIN_GRID = (100_000_000, 1_000_000_000, 10_000_000_000)
#: Chinchilla-optimal tokens-per-parameter (Hoffmann et al. 2022, ~20)
_CHIN_TPP = 20
#: diminishing-returns epoch ceiling for repeated data
#: (Muennighoff et al. 2023, 'Scaling Data-Constrained LMs', ~4)
_CHIN_MAX_EPOCHS = 4


@register(
    "curation_chinchilla_allocation",
    oracle=f"""
WITH corpus AS (
  SELECT CAST(SUM(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT)
           AS avail_tokens
  FROM documents
),
grid AS (
  SELECT unnest([{", ".join(f"CAST({n} AS BIGINT)" for n in _CHIN_GRID)}])
           AS n_params
)
SELECT g.n_params,
       c.avail_tokens,
       g.n_params * {_CHIN_TPP} AS needed_tokens,
       round(CAST(g.n_params * {_CHIN_TPP} AS DOUBLE) / c.avail_tokens, 6)
         AS epochs_needed,
       CASE
         WHEN g.n_params * {_CHIN_TPP} <= c.avail_tokens THEN 'single_epoch'
         WHEN CAST(g.n_params * {_CHIN_TPP} AS DOUBLE) / c.avail_tokens
              <= {_CHIN_MAX_EPOCHS} THEN 'repeat_ok'
         ELSE 'data_constrained'
       END AS verdict
FROM grid g CROSS JOIN corpus c
""",
    description="Compute-optimal TOKEN-BUDGET allocation report — the "
    "planning query a training-data pipeline answers before a run: for "
    "a model-size grid, Chinchilla-optimal token need (20 tokens/param, "
    "Hoffmann et al. 2022) vs the corpus's available tokens "
    "(ceil(chars/4), the curation_token_estimate heuristic), the "
    "implied EPOCHS over the corpus, and a verdict — 'single_epoch' "
    "(corpus covers the budget), 'repeat_ok' (<= 4 epochs, inside the "
    "diminishing-returns ceiling of Muennighoff et al. 2023), or "
    "'data_constrained' (more dedup'd/filtered data needed, not more "
    "repetition). Determinism: token counts and needs are exact "
    "BIGINTs; epochs is one 6-dp-rounded IEEE division. Shape: ONE "
    "corpus aggregate crossed into a 3-row literal grid — the output "
    "is grid-sized forever.",
    tags=("curation", "llm", "agg"),
)
def curation_chinchilla_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    corpus = (
        t(spark, sf_dir, "documents")
        .agg(
            F.sum(F.ceil(F.col("n_chars") / 4.0).cast("bigint"))
            .cast("bigint")
            .alias("avail_tokens")
        )
    )
    grid = local_df(
        spark, [(n,) for n in _CHIN_GRID], "n_params bigint"
    )
    needed = F.col("n_params") * _CHIN_TPP
    epochs = needed.cast("double") / F.col("avail_tokens")
    # bcast-ok: `corpus` is the 1-row ungrouped .agg total above, not
    # the documents table — scalar envelope at any SF
    return grid.crossJoin(F.broadcast(corpus)).select(
        "n_params",
        "avail_tokens",
        needed.alias("needed_tokens"),
        F.round(epochs, 6).alias("epochs_needed"),
        F.when(needed <= F.col("avail_tokens"), "single_epoch")
        .when(epochs <= _CHIN_MAX_EPOCHS, "repeat_ok")
        .otherwise("data_constrained")
        .alias("verdict"),
    )
