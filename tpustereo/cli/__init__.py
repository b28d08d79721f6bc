"""Command-line tools (SURVEY.md §2.2, §3 #12/#20):

    python -m tpustereo.cli match     — one pair -> disparity map
    python -m tpustereo.cli bench     — throughput + per-stage profile
    python -m tpustereo.cli eval      — D1-all / bad-2.0 vs ground truth
    python -m tpustereo.cli odometry  — stereo odometry over a sequence
"""

from tpustereo.cli.main import main  # noqa: F401
