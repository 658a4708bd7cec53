"""User-facing vectorized env API (gym3-compatible surface).

Placeholder — fleshed out once the first game is runnable.
"""


class ProcgenGym3Env:  # pragma: no cover - stub
    def __init__(self, *a, **k):
        raise NotImplementedError("wired up after the first game lands")


def ProcgenEnv(*a, **k):  # pragma: no cover - stub
    raise NotImplementedError
