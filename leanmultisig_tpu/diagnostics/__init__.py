from .profiler import format_profile, profile_execution  # noqa: F401
