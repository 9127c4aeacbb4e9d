"""Dataset-format conventions from the reference, made explicit.

The reference infers one of three schemas from column names and rejects
anything else (reference angle_emb/angle.py:51-61, per-batch variant
:134-152); it renames legacy columns (angle_trainer.py:227-230), samples
one string when a text field is a list (angle.py:117-122), shuffles with
a seed (angle_trainer.py:236-238) and head-limits for debugging
(examples/NLI/train_nli.py:214-217). Spark versions below; schema checks
run against df.schema before any job is submitted (fail fast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FORMATS = {
    "A": {"text1", "text2", "label"},
    "B": {"query", "positive"},
    "C": {"query", "positive", "negative"},
}


def detect_dataset_format(df: DataFrame) -> str:
    """'A' | 'B' | 'C' from column names (reference angle.py:51-61);
    raises NotImplementedError on unknown shapes like the reference."""
    cols = set(df.columns)
    # C before B: C's columns are a superset of B's
    for fmt in ("C", "A", "B"):
        if FORMATS[fmt] <= cols:
            if fmt == "B" and FORMATS["C"] <= cols:
                return "C"
            return fmt
    raise NotImplementedError(
        f"cannot detect dataset format from columns {sorted(cols)}; "
        "expected one of A=(text1,text2,label) B=(query,positive) "
        "C=(query,positive,negative)"
    )


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """legacy-name shim (reference angle_trainer.py:227-230)."""
    for old, new in mapping.items():
        df = df.withColumnRenamed(old, new)
    return df


def sample_from_list(df: DataFrame, col: str, seed: int) -> DataFrame:
    """pick one random element when the field is array<string>
    (reference angle.py:117-122); seeded rand -> reproducible plan."""
    idx = (F.floor(F.rand(seed) * F.size(col)) + 1).cast("int")
    return df.withColumn(col, F.element_at(F.col(col), idx))


def shuffle(df: DataFrame, seed: int) -> DataFrame:
    """dataset.shuffle(seed) analog (reference angle_trainer.py:236-238).
    A global orderBy(rand) is a full sort; at scale prefer
    repartition(rand)-style scatter, which is what this does."""
    return df.repartition(F.floor(F.rand(seed) * 10_000).cast("int"))


def head_limit(df: DataFrame, n: int | None) -> DataFrame:
    """debug_sample_size (reference train_nli.py:214-217)."""
    return df.limit(n) if n else df


def cast_label_double(df: DataFrame, col: str = "label") -> DataFrame:
    """float(label) (reference angle.py:166)."""
    return df.withColumn(col, F.col(col).cast("double"))
