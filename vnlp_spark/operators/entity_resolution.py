"""Entity canonicalization + linking (SURVEY A4/J6/W4, north-rule core).

Pipeline:
1. **canonical key** — the morphological root of the mention's head token
   (Turkish is head-final: last token of the span), Turkish-lowered and
   apostrophe-stripped.  'İstanbul'da', 'İstanbul'u', 'İstanbullu' all key
   to 'istanbul' — this is the reference's stem-based canonicalization
   (M1 roots as entity keys).
2. **entities table** — hash aggregate over canon keys; canonical surface =
   most frequent surface form (two-level ``max_by`` aggregate, no window);
   entity_id = ``xxhash64(key, type)``: deterministic, join-free at any
   scale (no monotonically_increasing_id / no driver sequence).
3. **similarity linking** — near-miss mentions (typos, unseen inflections)
   link to known entities via a *blocked* char-3-gram Jaccard join:
   block on (first-2-chars, type); similarity computed natively with
   array_intersect over n-gram sets.  The block join is salted
   (``salted_join``) because Zipfian head entities (İstanbul, Türkiye)
   concentrate whole blocks on one reducer.

Skew handling (explicit per north rule): ``salted_join`` splits each hot
key into N sub-keys on the big side and replicates the small side N ways —
on top of AQE's runtime skew-split, which is also enabled in session.py.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.normalizer import turkish_lower


def canonical_key(mention_col: Column | str, analyses_root: Column | str | None = None) -> Column:
    """Mention surface -> canonical entity key.  Prefers the morphological
    root when supplied; falls back to the apostrophe-stripped lowered
    surface of the head (last) word."""
    m = F.col(mention_col) if isinstance(mention_col, str) else mention_col
    head = F.element_at(F.split(m, " "), -1)
    surface_key = turkish_lower(F.split(head, "['’]")[0])
    if analyses_root is None:
        return surface_key
    r = F.col(analyses_root) if isinstance(analyses_root, str) else analyses_root
    return F.coalesce(r, surface_key)


def build_entities(mentions_df: DataFrame, key_col: str = "canon_key",
                   label_col: str = "label", surface_col: str = "mention") -> DataFrame:
    """mentions -> entities(entity_id, canonical, type, n_mentions).

    Two hash aggregates, both map-side-combining; the second groups the
    already-small (key, surface) table.  No window functions, no sort of
    the full mention set."""
    per_surface = mentions_df.groupBy(key_col, label_col, surface_col).agg(
        F.count(F.lit(1)).alias("surface_cnt")
    )
    return (
        per_surface.groupBy(key_col, label_col)
        .agg(
            # struct ordering makes the count-tie deterministic (max
            # surface wins) — a bare max_by would pick whichever surface
            # the partial-aggregate merge order happened to see first
            F.max_by(
                surface_col, F.struct(F.col("surface_cnt"), F.col(surface_col))
            ).alias("canonical"),
            F.sum("surface_cnt").alias("n_mentions"),
        )
        .select(
            F.xxhash64(F.col(key_col), F.col(label_col)).alias("entity_id"),
            F.col(key_col).alias("canon_key"),
            F.col("canonical"),
            F.col(label_col).alias("type"),
            F.col("n_mentions"),
        )
    )


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of a string, natively (no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit("^"), c, F.lit("$"))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(padded) - (n - 1), F.lit(1))),
            lambda i: padded.substr(i, F.lit(n)),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def salted_join(big: DataFrame, small: DataFrame, key: str, n_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: the big side gets a deterministic salt in
    [0, n_salts) derived from its row content; the small side is exploded
    n_salts ways.  Hot keys fan out across n_salts reducers instead of one.
    Column sets are preserved (salt columns dropped)."""
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def link_mentions(
    mentions_df: DataFrame,
    entities_df: DataFrame,
    key_col: str = "canon_key",
    label_col: str = "label",
    min_jaccard: float = 0.4,
    n_salts: int = 8,
    block_prefix: int = 2,
) -> DataFrame:
    """Link mentions whose key has NO exact entity to the nearest known
    entity by blocked char-3-gram Jaccard.

    Plan shape: exact hits resolve via broadcast/hash join on canon_key;
    the residual joins on (type, key-prefix) blocks — salted — and keeps
    argmax-similarity per mention via max_by aggregation (no sort)."""
    exact = mentions_df.join(
        entities_df.select(key_col, F.col("type").alias(label_col), "entity_id"),
        on=[key_col, label_col],
        how="left",
    )
    resolved = exact.filter(F.col("entity_id").isNotNull())
    unresolved = exact.filter(F.col("entity_id").isNull()).drop("entity_id")

    blocked_entities = entities_df.select(
        F.col("entity_id").alias("cand_id"),
        F.col("type").alias(label_col),
        F.col(key_col).alias("cand_key"),
        F.substring(key_col, 1, block_prefix).alias("_block"),
        char_ngrams(key_col).alias("_cand_grams"),
    )
    blocked_mentions = unresolved.withColumn(
        "_block", F.substring(key_col, 1, block_prefix)
    ).withColumn("_grams", char_ngrams(key_col))

    joined = salted_join(
        blocked_mentions, blocked_entities.withColumnRenamed(label_col, "_cand_label"),
        key="_block", n_salts=n_salts,
    ).filter(F.col(label_col) == F.col("_cand_label"))
    scored = joined.withColumn("_sim", jaccard(F.col("_grams"), F.col("_cand_grams"))).filter(
        F.col("_sim") >= min_jaccard
    )
    group_cols = [c for c in unresolved.columns]
    best = (
        scored.groupBy(*group_cols)
        .agg(F.max_by("cand_id", "_sim").alias("entity_id"))
    )
    still_unlinked = unresolved.join(best.select(*group_cols), on=group_cols, how="left_anti").withColumn(
        "entity_id", F.lit(None).cast("long")
    )
    return resolved.unionByName(best).unionByName(still_unlinked)
