"""Minimal numba stand-in so the reference scripts run as a test oracle
without numba installed (the hot loop runs as plain Python — fine at test
sizes)."""


def jit(func=None, **kwargs):
    if func is None:
        def wrap(f):
            return f

        return wrap
    return func


def njit(func=None, **kwargs):
    return jit(func, **kwargs)
