from .trace import RunLog, stage, set_run_log  # noqa: F401
