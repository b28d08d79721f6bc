from tpustereo.pipeline.sgbm import sgbm, sgbm_batched, sgbm_volume  # noqa: F401
