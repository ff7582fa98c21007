from .readers import (  # noqa: F401
    load_table,
    load_testdata,
    read_csv_sniffed,
    read_delta,
    read_excel_dim,
    read_jdbc,
)
from .sinks import write_csv, write_delta, write_jdbc, write_parquet  # noqa: F401
