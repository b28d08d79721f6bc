from tpustereo.utils.shapes import ceil_div, round_up  # noqa: F401
