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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.normalizer import turkish_lower


# generic organizational HEAD words (closed class): a multiword entity
# ending in one of these is distinctive in its NON-head words — keying
# it by the head alone conflates every "X Bankası" into one entity
# (Ziraat/İş/Garanti/Merkez Bankası all collapsed to 'bankası'; Koç and
# Sabancı Holding to 'holding').  Surfaced by the round-5 232-entity
# linking gold; for these, the canon key is the clitic-stripped FULL
# surface.  Bare-root and possessed-head forms both listed so the
# morphological-root path triggers identically.
GENERIC_ORG_HEADS = frozenset({
    "banka", "bankası", "üniversite", "üniversitesi",
    "bakanlık", "bakanlığı", "ajans", "ajansı", "holding",
    "jk", "fk", "kulüp", "kulübü", "belediye", "belediyesi",
    "müdürlük", "müdürlüğü", "başkanlık", "başkanlığı",
    "mahkeme", "mahkemesi", "kurum", "kurumu", "kurul", "kurulu",
    "grup", "grubu", "borsa", "borsası", "federasyon", "federasyonu",
    "dernek", "derneği", "vakıf", "vakfı", "oda", "odası",
    "birlik", "birliği", "sigorta", "sigortası", "yolları",
    "takım", "takımı",
})


def canonical_key(mention_col: Column | str, analyses_root: Column | str | None = None) -> Column:
    """Mention surface -> canonical entity key.  The head (last) word,
    apostrophe-clitic-stripped and lowered; the morphological root wins
    over the head surface when supplied — EXCEPT when the head word is a
    generic organizational head (GENERIC_ORG_HEADS) of a multiword
    surface, where the key is the clitic-stripped lowered FULL surface
    on both paths (the root path must not fragment from the surface
    path: edge endpoints carry no analyses)."""
    m = F.col(mention_col) if isinstance(mention_col, str) else mention_col
    words = F.split(m, " ")
    nw = F.size(words)
    head = F.element_at(words, -1)
    head_key = turkish_lower(F.split(head, "['’]")[0])
    full_key = F.concat(
        turkish_lower(F.concat_ws(" ", F.slice(words, 1, nw - 1))),
        F.lit(" "), head_key)
    generic = (nw > 1) & head_key.isin(*GENERIC_ORG_HEADS)
    surface_key = F.when(generic, full_key).otherwise(head_key)
    if analyses_root is None:
        return surface_key
    r = F.col(analyses_root) if isinstance(analyses_root, str) else analyses_root
    return F.when(generic, full_key).otherwise(F.coalesce(r, head_key))


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


def fold_key(col: Column | str) -> Column:
    """ASCII-fold a canon key for BLOCKING and n-gram similarity only
    (linking identity stays on the true key): web text freely drops
    Turkish diacritics (Istanbul, Turkiye, Besiktas), which otherwise
    breaks both the prefix block and the gram overlap.  Native
    ``translate`` — no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, "çğıöşüâîû", "cgiosuaiu")


# fold_key images of GENERIC_ORG_HEADS, for similarity-time stripping
_GENERIC_FOLDED = (
    "ajans", "ajansi", "bakanligi", "bakanlik", "banka", "bankasi",
    "baskanligi", "baskanlik", "belediye", "belediyesi", "birligi",
    "birlik", "borsa", "borsasi", "dernegi", "dernek", "federasyon",
    "federasyonu", "fk", "grubu", "grup", "holding", "jk", "kulubu",
    "kulup", "kurul", "kurulu", "kurum", "kurumu", "mahkeme",
    "mahkemesi", "mudurlugu", "mudurluk", "oda", "odasi", "sigorta",
    "sigortasi", "takim", "takimi", "universite", "universitesi",
    "vakfi", "vakif", "yollari",
)


def strip_generic_head(folded_key: Column) -> Column:
    """Drop a trailing generic organizational head from a FOLDED
    multiword key for blocking/similarity only: the distinctive part
    carries the identity ('akdeniz universitesi' vs 'ankara
    universitesi' must NOT gram-match on the shared head; the partial
    mention 'ziraat' MUST match 'ziraat bankasi')."""
    words = F.split(folded_key, " ")
    nw = F.size(words)
    head = F.element_at(words, -1)
    return F.when(
        (nw > 1) & head.isin(*_GENERIC_FOLDED),
        F.concat_ws(" ", F.slice(words, 1, nw - 1)),
    ).otherwise(folded_key)


def containment(cand: Column, mention: Column) -> Column:
    """|cand ∩ mention| / |cand| — the asymmetric overlap that catches
    FUSED suffixed surfaces (İzmirliler ⊇ izmir's grams) where Jaccard
    is diluted by the suffix grams."""
    inter = F.size(F.array_intersect(cand, mention))
    return F.when(F.size(cand) > 0, inter / F.size(cand)).otherwise(F.lit(0.0))


# conventional short forms of the big Turkish clubs — a tiny CLOSED
# public set (same gazetteer argument as the reference's NER lists)
TURKISH_CLUB_ABBREVIATIONS = {
    "gs": "galatasaray",
    "fb": "fenerbahçe",
    "bjk": "beşiktaş",
    "ts": "trabzonspor",
}


def initials_aliases(entities_df: DataFrame) -> DataFrame:
    """entities -> (alias_key, type, entity_id) rows: folded initials of
    multi-word canonicals (Türk Hava Yolları -> thy) plus the curated
    club short forms.  Consulted as a second EXACT path in
    link_mentions — broadcast-sized by construction."""
    multi = entities_df.filter(F.size(F.split("canonical", " ")) >= 2)
    initials = multi.select(
        fold_key(turkish_lower(F.concat_ws(
            "", F.transform(F.split("canonical", " "),
                            lambda w: F.substring(w, 1, 1))
        ))).alias("alias_key"),
        F.col("type"),
        F.col("entity_id"),
    ).filter(F.length("alias_key") >= 2)
    club_rows = F.array(*[
        F.struct(F.lit(k).alias("alias_key"), F.lit(v).alias("canon_key"))
        for k, v in TURKISH_CLUB_ABBREVIATIONS.items()
    ])
    clubs = (
        entities_df.select("entity_id", "type", "canon_key")
        .join(
            entities_df.sparkSession.range(1).select(
                F.explode(club_rows).alias("a"))
            .select("a.alias_key", "a.canon_key"),
            on="canon_key")
        .select("alias_key", "type", "entity_id")
    )
    return initials.unionByName(clubs).distinct()


from pyspark.sql.types import IntegerType as _IntegerType


@F.pandas_udf(_IntegerType())
def _damerau_levenshtein_udf(a: "pd.Series", b: "pd.Series") -> "pd.Series":
    """Bounded Damerau-Levenshtein on BLOCKED candidate pairs — the
    verify stage of the similarity join (runs only on the residual that
    failed the gram thresholds, a tiny fraction of the block join)."""

    def dl(x: str, y: str) -> int:
        if x is None or y is None:
            return 99
        lx, ly = len(x), len(y)
        if abs(lx - ly) > 2:
            return 99
        prev2: list = []
        prev = list(range(ly + 1))
        for i in range(1, lx + 1):
            cur = [i] + [0] * ly
            for j in range(1, ly + 1):
                cost = 0 if x[i - 1] == y[j - 1] else 1
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
                if (i > 1 and j > 1 and x[i - 1] == y[j - 2]
                        and x[i - 2] == y[j - 1]):
                    cur[j] = min(cur[j], prev2[j - 2] + 1)
            prev2, prev = prev, cur
        return prev[ly]

    import pandas as pd

    return pd.Series([dl(x, y) for x, y in zip(a, b)], dtype="int32")


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
    min_containment: float = 0.7,
    max_edit: int = 1,
    n_salts: int = 8,
    block_prefix: int = 2,
    aliases_df: DataFrame | None = None,
) -> DataFrame:
    """Link mentions whose key has NO exact entity to the nearest known
    entity by a blocked ASCII-folded char-3-gram join with a bounded
    edit-distance verify.

    Plan shape (all join sides explicit, nothing all-pairs):
    1. exact hits resolve via hash join on (canon_key, type);
    2. alias exact hits (initials / curated short forms) on the folded
       key — broadcast-sized by construction;
    3. the residual joins on (type, FOLDED-key prefix) blocks — salted —
       and a candidate passes on folded-gram Jaccard >= ``min_jaccard``,
       OR candidate-gram containment >= ``min_containment`` (fused
       suffixed surfaces: İzmirliler ⊇ izmir), OR Damerau-Levenshtein
       <= ``max_edit`` with matching first char (typos the gram overlap
       dilutes: Ankra, Anakra).  Argmax by (score, -distance) via one
       max_by aggregation — no sort, no window."""
    exact = mentions_df.join(
        entities_df.select(key_col, F.col("type").alias(label_col), "entity_id"),
        on=[key_col, label_col],
        how="left",
    )
    resolved = exact.filter(F.col("entity_id").isNotNull())
    unresolved = exact.filter(F.col("entity_id").isNull()).drop("entity_id")

    if aliases_df is not None:
        ali = unresolved.withColumn("_fkey", fold_key(key_col)).join(
            F.broadcast(aliases_df.select(
                F.col("alias_key").alias("_fkey"),
                F.col("type").alias(label_col),
                F.col("entity_id"))),
            on=["_fkey", label_col], how="left",
        ).drop("_fkey")
        resolved = resolved.unionByName(
            ali.filter(F.col("entity_id").isNotNull()))
        unresolved = ali.filter(F.col("entity_id").isNull()).drop("entity_id")

    blocked_entities = entities_df.select(
        F.col("entity_id").alias("cand_id"),
        F.col("type").alias("_cand_label"),
        F.col(key_col).alias("cand_key"),
        strip_generic_head(fold_key(key_col)).alias("_cand_fkey"),
    ).withColumn("_block", F.substring("_cand_fkey", 1, block_prefix)) \
        .withColumn("_cand_grams", char_ngrams("_cand_fkey"))
    blocked_mentions = unresolved.withColumn(
        "_fkey", strip_generic_head(fold_key(key_col))) \
        .withColumn("_block", F.substring("_fkey", 1, block_prefix)) \
        .withColumn("_grams", char_ngrams("_fkey"))

    joined = salted_join(
        blocked_mentions, blocked_entities,
        key="_block", n_salts=n_salts,
    ).filter(F.col(label_col) == F.col("_cand_label"))
    scored = joined.withColumn(
        "_jac", jaccard(F.col("_grams"), F.col("_cand_grams"))
    ).withColumn(
        "_cont", containment(F.col("_cand_grams"), F.col("_grams"))
    ).withColumn(
        # edit-verify only where the cheap gram gate failed but the pair
        # is plausibly a typo (same first char, close length)
        "_dl",
        F.when(
            (F.col("_jac") >= min_jaccard)
            | (F.col("_cont") >= min_containment),
            F.lit(0),
        ).when(
            (F.substring("_fkey", 1, 1) == F.substring("_cand_fkey", 1, 1))
            & (F.abs(F.length("_fkey") - F.length("_cand_fkey")) <= 2),
            _damerau_levenshtein_udf("_fkey", "_cand_fkey"),
        ).otherwise(F.lit(99)),
    ).filter(
        (F.col("_jac") >= min_jaccard)
        | (F.col("_cont") >= min_containment)
        | (F.col("_dl") <= max_edit)
    )
    group_cols = [c for c in unresolved.columns]
    best = (
        scored.groupBy(*group_cols)
        .agg(F.max_by(
            "cand_id",
            F.struct(F.greatest("_jac", "_cont"), -F.col("_dl")),
        ).alias("entity_id"))
    )
    still_unlinked = unresolved.join(best.select(*group_cols), on=group_cols, how="left_anti").withColumn(
        "entity_id", F.lit(None).cast("long")
    )
    return resolved.unionByName(best).unionByName(still_unlinked)
