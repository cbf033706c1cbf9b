"""Pre-gathered per-point parameters.

The physics indexes the replicated lookup tables as ``table[lutyp]``
every step.  Since lutyp/sltyp/... are static per point, those gathers
can be done once per domain: this module wraps each gathered (n, ...)
array in a :class:`PreGathered` whose ``__getitem__`` ignores the index,
so the *same physics code* runs with zero gathers — required for the
fused Pallas column kernel (Mosaic has no general gather) and a minor
win for the XLA path.
"""

from __future__ import annotations

import jax

from .tables import Params, VegParams, SoilParams


@jax.tree_util.register_pytree_node_class
class PreGathered:
    """Wraps an already-gathered value; ``pg[idx]`` returns the value."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __getitem__(self, idx):
        # table[lutyp] -> gathered value; table[lutyp, j] -> value[j]
        if isinstance(idx, tuple) and len(idx) > 1:
            rest = idx[1:]
            return self.v[rest[0] if len(rest) == 1 else rest]
        return self.v

    def tree_flatten(self):
        return (self.v,), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(children[0])

    def __repr__(self):
        return f"PreGathered({self.v!r})"


# table fields indexed per point, per sub-pytree
_VEG_BY_LUTYP = [f for f in VegParams._fields
                 if f not in ("isurban", "iswater", "isbarren", "isice",
                              "isegblf")]
_SOIL_BY_SLTYP = [f for f in SoilParams._fields
                  if f not in ("albsat", "albdry")]
_SOIL_BY_ISC = ["albsat", "albdry"]
_GEN_BY_SLP = ["slope"]


def gather_params(params: Params, lutyp, sltyp, isc,
                  slptyp) -> Params:
    """Build a Params pytree whose table lookups are no-ops.

    The returned object is drop-in for the physics: ``veg.hvt[lutyp]``
    yields the (n,)-gathered values (a scalar under vmap).  Scalar
    fields (special class indices, gen scalars) pass through unchanged.
    """
    v, s, g = params.veg, params.soil, params.gen

    veg = v._replace(**{f: PreGathered(getattr(v, f)[lutyp])
                        for f in _VEG_BY_LUTYP})
    soil = s._replace(**{f: PreGathered(getattr(s, f)[sltyp])
                         for f in _SOIL_BY_SLTYP},
                      albsat=PreGathered(s.albsat[isc]),
                      albdry=PreGathered(s.albdry[isc]))
    gen = g._replace(slope=PreGathered(g.slope[slptyp]))
    return Params(veg=veg, soil=soil, gen=gen)
