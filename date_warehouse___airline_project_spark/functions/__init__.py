"""Scalar function library — native Column expressions for every scalar
the reference implements (SURVEY.md §2.8–2.11; reference
backend/functions/functions.py and backend/etl_scripts/cleaning.py).

Everything here is a JVM-side expression (whole-stage codegen); a Python
UDF exists only where no native expression can reproduce the semantics
(``add_business_days`` is expressed via sequence+filter, fuzzy ratios live
in operators/fuzzy.py).
"""

from .strings import (  # noqa: F401
    capitalize_first,
    collapse_whitespace,
    digits_only,
    header_sanitize,
    mask_address,
    mask_email,
    mask_phone,
    name_first_last,
    prefix_alnum,
    strip_currency,
    strip_non_alpha,
    title_case,
)
from .dates import (  # noqa: F401
    add_business_days,
    age_years,
    date_range_overlap,
    delay_minutes,
    flight_duration_hours,
    to_standard_date,
)
from .math_fns import (  # noqa: F401
    amount_consistent,
    clip_money,
    convert_currency,
    haversine_km,
    in_numeric_range,
    refund_amount,
    to_numeric,
)
from .json_fns import parse_json_with_raw_fallback  # noqa: F401
from .keys import (  # noqa: F401
    airline_hash,
    booking_hash,
    flight_hash,
    passenger_hash,
)
