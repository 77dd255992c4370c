from monortm_tpu.utils.trace import StageTimer, named_scope, profile_trace

__all__ = ["StageTimer", "named_scope", "profile_trace"]
