from .kv import join_key_val, split_key_val, to_lines  # noqa: F401
