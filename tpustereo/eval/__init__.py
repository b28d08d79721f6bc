from tpustereo.eval.metrics import d1_all, bad, end_point_error  # noqa: F401
