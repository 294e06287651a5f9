"""Bind constructor kwargs into a callable class BY VALUE.

Ray Data ships ``fn_constructor_kwargs`` through the object store; with the
actor pool's default ``max_restarts > 0`` a restart after those objects are
lost cannot re-create the actor (ray#53727 — Ray warns about exactly this at
actor submission). For the tiny configs our stages need (a couple of ints /
bools) the safe shape is a dynamically-defined subclass: cloudpickle
serializes locally-defined classes by value, so the bound kwargs travel
inside the actor's serialized class definition and restarts never read the
object store.
"""

from __future__ import annotations


def bound_class(cls: type, **kwargs) -> type:
    """A no-arg subclass of ``cls`` with ``kwargs`` baked into __init__."""

    class _Bound(cls):  # type: ignore[misc, valid-type]
        def __init__(self):
            super().__init__(**kwargs)

    _Bound.__name__ = cls.__name__
    _Bound.__qualname__ = cls.__qualname__
    return _Bound
