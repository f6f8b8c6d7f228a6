from .timing import start_timer, end_timer, timer, add_to_trace  # noqa: F401
