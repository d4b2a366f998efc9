from tenzir_spark.sources import formats
from tenzir_spark.sources.formats import (
    read_json, read_suricata, read_zeek_json, read_xsv, read_csv, read_tsv,
    read_ssv, read_lines, read_zeek_tsv, read_cef, read_yaml, read_parquet,
    write_json, write_xsv, write_parquet, write_zeek_tsv, compressed_write,
)
from tenzir_spark.sources.netflow import read_netflow
from tenzir_spark.sources.pcap import read_pcap, write_pcap
from tenzir_spark.sources.shell import run_shell

__all__ = [
    "formats", "read_json", "read_suricata", "read_zeek_json", "read_xsv",
    "read_csv", "read_tsv", "read_ssv", "read_lines", "read_zeek_tsv",
    "read_cef", "read_yaml", "read_parquet", "write_json", "write_xsv",
    "write_parquet", "write_zeek_tsv", "compressed_write",
    "read_pcap", "write_pcap", "read_netflow", "run_shell",
]
