from rnadam_spark.functions.shingles import char_shingles, token_ngrams, tokens  # noqa: F401
from rnadam_spark.functions.hashing import poly_hash_col, poly_hash_sql  # noqa: F401
