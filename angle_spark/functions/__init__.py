from angle_spark.functions.tokenizer import (  # noqa: F401
    TOKENIZER_VERSION,
    duckdb_tokens_sql,
    tokenize_py,
    tokens_col,
)
