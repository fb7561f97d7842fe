from iniz_exporters_spark.functions.mysql import (  # noqa: F401
    mysql_group_concat,
    mysql_cast_unsigned,
    strip_newlines,
    pack_kv,
)
from iniz_exporters_spark.functions.text import (  # noqa: F401
    tokens,
    char_shingles,
    poly_hash,
    whitespace_token_count,
)
