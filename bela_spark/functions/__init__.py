from bela_spark.functions.text import (  # noqa: F401
    normalized,
    tokens_of,
    shingles_of,
    record_id,
)
from bela_spark.functions.hashing import (  # noqa: F401
    minhash_signatures,
    band_keys,
    simhash32,
)
from bela_spark.functions.strings import lev_sim, jaro_winkler_udf  # noqa: F401
from bela_spark.functions.vectors import dot_product, cosine_sim, embed_text  # noqa: F401
