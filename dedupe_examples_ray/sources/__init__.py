from .io import (  # noqa: F401
    compact_parquet,
    read_parquet_clean,
    read_parquet_union_by_name,
    read_partitioned,
    read_table,
    read_tagged_sources,
    repair_ragged_lines,
    write_annotated_output,
    write_entity_map,
    write_partitioned,
    zonemap_plan,
)
from .warc import (  # noqa: F401
    format_warc_records,
    parse_warc_bytes,
    read_warc,
    write_warc,
)
from .wet import (  # noqa: F401
    format_wet_records,
    parse_wet_bytes,
    read_wet,
    write_wet,
)
