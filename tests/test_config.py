"""Parameter-file parsing: reference JSON schema round-trip and the strict
unknown-key check (the reference aborts naming the exact key,
appsrc/thunder.cpp:41-77)."""

import pytest

from thunder_tpu.config import Para, load_para


def _demo_like():
    return {
        "Basic": {
            "Number of Threads Per Process": 4,
            "2D or 3D Mode": "3D",
            "Size of Image": 160,
            "Pixel Size (Angstrom)": 1.32,
            "Symmetry": "C4",
        },
        "Advanced": {
            "Padding Factor": 2,
            "Number of Sampling Points for Scanning in Global Search (3D)":
                10000,
            "Number of Sampling Points of Rotation in Local Search (3D)": 125,
        },
    }


def test_load_para_schema():
    p = load_para(_demo_like())
    assert (p.size, p.sym, p.pf, p.m_s, p.m_l_r) == (160, "C4", 2, 10000, 125)
    assert p.mode == "3d"


def test_strict_rejects_unknown_key():
    src = _demo_like()
    src["Advanced"]["Padding Facto"] = 2  # typo
    with pytest.raises(KeyError, match="Padding Facto"):
        load_para(src, strict=True)
    with pytest.warns(UserWarning, match="Padding Facto"):
        load_para(src)


def test_strict_rejects_unknown_section():
    src = _demo_like()
    src["Basics"] = {"Size of Image": 2}
    with pytest.raises(KeyError, match="Basics"):
        load_para(src, strict=True)
