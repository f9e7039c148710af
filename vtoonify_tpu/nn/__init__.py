from vtoonify_tpu.nn import layers  # noqa: F401
