from .cleansing import (  # noqa: F401
    SENTINELS,
    clean_csv_value,
    coerce_timestamp,
    dedupe_names,
    extract_keyed_value,
    fill_sentinels,
    format_col_name,
    repair_amount,
    validate_uuid,
)
