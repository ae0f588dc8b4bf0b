from feature_engineering_tk_spark.sources.jsonl import (  # noqa: F401
    parse_chat_jsonl,
    parse_rejects,
    read_transcripts_jsonl,
    read_transcripts_jsonl_stream,
    write_transcripts_jsonl,
)
from feature_engineering_tk_spark.sources.tables import (  # noqa: F401
    ensure_schema,
    iceberg_available,
    load_table,
    read_delimited,
    write_table,
)
