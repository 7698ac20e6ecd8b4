"""Native OBJ parser (royaltracer_dx_tpu/native): exact parity with the
pure-Python loader, which remains the behavioral spec."""

import os

import numpy as np
import pytest

from royaltracer_dx_tpu import native
from royaltracer_dx_tpu.scene import obj_loader

REFERENCE_INCLUDE = "/root/reference/Pathtracer/include"


def _parity(path):
    a = obj_loader.load_obj(path, use_native=False)
    b = obj_loader.load_obj(path, use_native=True)
    assert np.array_equal(a["vertices"], b["vertices"])
    assert np.array_equal(a["normals"], b["normals"])
    assert np.array_equal(a["indices"], b["indices"])
    assert np.array_equal(a["tri_material"], b["tri_material"])
    assert a["materials"] == b["materials"]


@pytest.mark.skipif(native.parse_obj_geometry.__globals__["_build"]() is None,
                    reason="no C compiler available")
@pytest.mark.parametrize("name", ["garage.obj", "monke.obj"])
def test_reference_assets_parity(name):
    path = os.path.join(REFERENCE_INCLUDE, name)
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    _parity(path)


@pytest.mark.skipif(native.parse_obj_geometry.__globals__["_build"]() is None,
                    reason="no C compiler available")
def test_synthetic_edge_cases(tmp_path):
    src = "\n".join([
        "mtllib missing.mtl",
        "v 0 0 0", "v 1 0 0", "v 1 1 0", "v 0 1 0", "v 0.5 0.5 1",
        "vn 0 0 1", "vn 1 0 0",
        "f 1//1 2//1 3//1 4//1",         # quad, v//vn
        "usemtl nope",                    # unknown material -> default
        "f -5 -4 -1",                     # negative indices, no normals
        "f 1/9/2 2/9/2 5/9/2",            # v/vt/vn (vt ignored)
    ])
    p = tmp_path / "t.obj"
    p.write_text(src)
    _parity(str(p))
