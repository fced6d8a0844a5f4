from otamg.diag.metrics import RunLog, plot_run, solver_report  # noqa: F401
