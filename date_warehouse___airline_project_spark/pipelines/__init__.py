from .cleaners import (  # noqa: F401
    clean_airlines,
    clean_airlinesales,
    clean_airports,
    clean_flights,
    clean_passengers,
    clean_transactions,
)
from .eligibility import check_eligibility  # noqa: F401
