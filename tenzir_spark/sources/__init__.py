from tenzir_spark.sources import formats
from tenzir_spark.sources.formats import (
    read_json, read_suricata, read_zeek_json, read_xsv, read_csv, read_tsv,
    read_ssv, read_lines, read_zeek_tsv, read_cef, read_yaml, read_parquet,
    write_json, write_xsv, write_parquet, write_zeek_tsv, compressed_write,
)

__all__ = [
    "formats", "read_json", "read_suricata", "read_zeek_json", "read_xsv",
    "read_csv", "read_tsv", "read_ssv", "read_lines", "read_zeek_tsv",
    "read_cef", "read_yaml", "read_parquet", "write_json", "write_xsv",
    "write_parquet", "write_zeek_tsv", "compressed_write",
]
