from .registry import REGISTRY, Query, query  # noqa: F401


def load_all() -> None:
    """Import every plan module so their @query decorators register."""
    from . import relational  # noqa: F401
    from . import cleaning_queries  # noqa: F401
    from . import text  # noqa: F401
    from . import similarity  # noqa: F401
    from . import dedup  # noqa: F401
    from . import event_windows  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import warehouse_queries  # noqa: F401
    from . import function_battery  # noqa: F401
    from . import sql_surface  # noqa: F401
    from . import subqueries  # noqa: F401
    from . import analytic  # noqa: F401
    from . import temporal  # noqa: F401
    from . import agg_battery  # noqa: F401
    from . import sampling  # noqa: F401
    from . import profiling  # noqa: F401
    from . import tpch_more  # noqa: F401
    from . import joins_setops  # noqa: F401
    from . import modern_sql  # noqa: F401
    from . import arrays_lambda  # noqa: F401
    from . import semistructured  # noqa: F401
    from . import robustness  # noqa: F401
    from . import timeseries  # noqa: F401
    from . import training_data  # noqa: F401
    from . import sketches  # noqa: F401
    from . import mining  # noqa: F401
    from . import layout  # noqa: F401
    from . import connectors  # noqa: F401
