from . import bits, rng, io, profiling  # noqa: F401
