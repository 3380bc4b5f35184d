from .csv_sinks import write_sizing_outputs  # noqa: F401
