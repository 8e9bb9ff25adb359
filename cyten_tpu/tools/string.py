"""Tools for handling strings. Reference: cyten/tools/string.py."""

__all__ = ['format_like_list']


def format_like_list(it) -> str:
    """Format elements of an iterable as if it were a plain list: ``[a, b, c]``."""
    return f'[{", ".join(map(str, it))}]'
