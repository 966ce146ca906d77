"""Deterministic JSON document generators.

Seeded Python port of the reference QuickCheck generators
(test/Data/Aeson/Arbitrary.hs:33-103): depth-bounded arbitrary JSON values,
objects with required/optional/additional-property knobs, and arrays with
length ranges. Used to materialize the valid/invalid corpus that the
reference pins only via QuickCheck properties (CONFORMANCE.md describes a
validator/{valid,invalid} layout that does not exist in the repo).

Everything is driven by ``random.Random(seed)`` — same seed, same docs,
across processes and runs.
"""

from __future__ import annotations

from random import Random

_KEY_ALPHABET = "abcdefghijklmnopqrstuvwxyzABCXYZ_0123456789-é中 "


class ObjGenOpts:
    """Required props, optional props, min/max additional-property count
    (Arbitrary.hs:33-38)."""

    def __init__(self, props, opt_props, min_additional, max_additional):
        self.props = list(props)
        self.opt_props = list(opt_props)
        self.min_additional = min_additional
        self.max_additional = max_additional


class JsonGen:
    def __init__(self, seed: int = 42):
        self.rng = Random(seed)

    # -- primitives ---------------------------------------------------------
    def _string(self) -> str:
        rng = self.rng
        n = rng.randint(0, 12)
        return "".join(rng.choice(_KEY_ALPHABET) for _ in range(n))

    def _number(self):
        rng = self.rng
        k = rng.randrange(4)
        if k == 0:
            return rng.randint(-(10**9), 10**9)
        if k == 1:
            return rng.randint(-50, 50)
        if k == 2:
            return round(rng.uniform(-1e6, 1e6), 6)
        return rng.gauss(0.0, 100.0)

    # -- makeRandomValue (Arbitrary.hs:73-82) -------------------------------
    def value(self, depth: int = 5):
        rng = self.rng
        choice = rng.randint(0, 3 if depth <= 0 else 5)
        if choice == 0:
            return None
        if choice == 1:
            return rng.random() < 0.5
        if choice == 2:
            return self._number()
        if choice == 3:
            return self._string()
        if choice == 4:
            # pass depth unchanged: array()/obj() generate elements at
            # depth-1 themselves (Arbitrary.hs calls makeRandomArray at the
            # SAME depth) — decrementing here too halved max nesting, so
            # the corpus never exercised validator recursion past ~3 levels
            return self.array((0, 10), depth)
        return self.obj(ObjGenOpts([], [], 0, 10), depth)

    # -- makeRandomArray (Arbitrary.hs:84-87); top-level depth 2 ------------
    def array(self, length_range: tuple[int, int], depth: int = 2) -> list:
        n = self.rng.randint(*length_range)
        return [self.value(depth - 1) for _ in range(n)]

    # -- makeRandomObject (Arbitrary.hs:89-100); top-level depth 2 ----------
    def obj(self, opts: ObjGenOpts, depth: int = 2) -> dict:
        rng = self.rng
        n_additional = rng.randint(opts.min_additional, opts.max_additional)
        gen_keys = [self._string() for _ in range(n_additional)]
        some_optional = [k for k in opts.opt_props if rng.random() < 0.5]
        keys = gen_keys + opts.props + some_optional
        # Later keys win on collision, mirroring HM.fromList / dict order.
        return {k: self.value(depth - 1) for k in keys}


# -- type predicates (Arbitrary.hs:45-67), used by conformance predicates ----
def is_null(v):
    return v is None


def is_bool(v):
    return v is True or v is False


def is_number(v):
    return not is_bool(v) and isinstance(v, (int, float))


def is_string(v):
    return isinstance(v, str)


def is_array(v):
    return isinstance(v, list)


def is_object(v):
    return isinstance(v, dict)
