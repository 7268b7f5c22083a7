from . import bits, rng, io  # noqa: F401
