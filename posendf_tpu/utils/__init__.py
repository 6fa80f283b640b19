from posendf_tpu.utils.profiling import StepTimer, enable_nan_debugging, trace

__all__ = ["StepTimer", "enable_nan_debugging", "trace"]
