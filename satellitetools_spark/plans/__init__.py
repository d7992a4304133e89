from .pipeline import get_s2_qi_and_data, flagship_timeseries  # noqa: F401
