"""Record linkage: blocked fuzzy-match pairs (entity resolution).

The classic ER recipe at 10^12 rows: NEVER all-pairs — derive a cheap
deterministic blocking key per record, self-join on block equality, and
run the expensive string distance only inside blocks, behind a
length-band guard that discards most candidates before the O(m*n)
edit-distance loop runs.

Scale shape: one shuffle on the block key (skew = oversized blocks; the
mitigation is a more selective key, same dial as dedup's shingle ``n``);
the length band is an ordinary join predicate evaluated pre-distance;
``levenshtein`` is a JVM built-in (whole-stage codegen), so the hot loop
never leaves Tungsten.

(The reference has no linkage surface; this serves the training-data
curation layer, like ops/dedup — near-dup captions/titles that exact and
shingle dedup miss because the strings are short.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Column,
    max_dist: int = 2,
) -> DataFrame:
    """Within-block fuzzy-match pairs: (id1, id2, dist) with
    ``levenshtein(text1, text2) <= max_dist`` and id1 < id2, candidates
    restricted to rows sharing the ``block`` expression's value.

    The length-band predicate ``abs(len(a)-len(b)) <= max_dist`` is a
    *correct* pre-filter (edit distance is bounded below by the length
    difference), so it only discards true negatives — cheap codegen
    comparisons ahead of the DP loop.  NULL texts/blocks never match
    (join on a NULL key is false).
    """
    a = df.select(
        block.alias("__blk"),
        F.col(id_col).alias("id1"),
        F.col(text_col).alias("__t1"),
    )
    b = df.select(
        block.alias("__blk"),
        F.col(id_col).alias("id2"),
        F.col(text_col).alias("__t2"),
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id1") < F.col("id2"))
        .filter(
            F.abs(F.length("__t1") - F.length("__t2")) <= F.lit(max_dist)
        )
        .withColumn("dist", F.levenshtein(F.col("__t1"), F.col("__t2")))
        .filter(F.col("dist") <= F.lit(max_dist))
        .select("id1", "id2", "dist")
    )
