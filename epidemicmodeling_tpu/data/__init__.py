from .preprocess import (
    OXFORD_NPI_COLUMNS,
    NPI_MAXES_DEFAULT,
    clean_case_series,
    forward_fill_npis,
    preprocess_region,
    RegionBatch,
    build_region_batch,
)
from .oxford import (load_oxford_data, load_populations, load_geo_list,
                     load_npi_costs)
from .synthetic import (synthetic_oxford_frame,
                        realistic_oxford_frame,
                        to_oxcgrt_latest_schema)
from .xprize_io import (write_predictions_csv, write_prescriptions_csv,
                        read_future_ip)

__all__ = [
    "OXFORD_NPI_COLUMNS", "NPI_MAXES_DEFAULT",
    "clean_case_series", "forward_fill_npis", "preprocess_region",
    "RegionBatch", "build_region_batch",
    "load_oxford_data", "load_populations", "load_geo_list",
    "load_npi_costs",
    "synthetic_oxford_frame",
    "realistic_oxford_frame",
    "to_oxcgrt_latest_schema",
    "write_predictions_csv", "write_prescriptions_csv", "read_future_ip",
]
