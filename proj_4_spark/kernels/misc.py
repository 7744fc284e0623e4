"""Misc projections + affine/geogoffset — placeholders filled in milestone 2.

Reference: src/projections/{gnom,ortho,moll,gn_sinu,eqearth,robin}.cpp,
src/transformations/affine.cpp.
"""

from __future__ import annotations

from proj_4_spark.kernels.base import PJ, ProjError


def _todo(name):
    def setup(P: PJ) -> PJ:
        raise ProjError("unsupported", f"{name} not yet implemented")

    return setup


setup_gnom = _todo("gnom")
setup_ortho = _todo("ortho")
setup_moll = _todo("moll")
setup_sinu = _todo("sinu")
setup_eqearth = _todo("eqearth")
setup_robin = _todo("robin")
setup_affine = _todo("affine")
setup_geogoffset = _todo("geogoffset")
