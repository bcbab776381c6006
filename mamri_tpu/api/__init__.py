__all__ = ["MamriEngine", "ActionState", "PoseEstimate", "TrajectoryPlan"]

_EXPORTS = {
    "MamriEngine": "mamri_tpu.api.engine",
    "ActionState": "mamri_tpu.api.types",
    "PoseEstimate": "mamri_tpu.api.types",
    "TrajectoryPlan": "mamri_tpu.api.types",
}


# Lazy exports (PEP 562): `from mamri_tpu.api.server import supervise` must
# not drag MamriEngine (and with it jax + the device runtime) into the
# process — the serve supervisor stays import-light so leaked device state
# dies with each recycled worker, never accumulating in the parent.
def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module 'mamri_tpu.api' has no attribute {name!r}")
