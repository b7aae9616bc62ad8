"""Observability subsystem: named loggers -> thunder.log
(src/Logging.cpp:6-27), per-round timing + phase counts, SNR/tau
bookkeeping (Model::refreshSNR src/Model.cpp:889), and the Sig/Tau/Timing
round dumps (saveSig/saveTau src/Optimiser.cpp:9091-9180)."""

import numpy as np

from thunder_tpu.parallel.mesh import make_mesh
from thunder_tpu.utils import (check_memory_usage, get_logger, host_rss_mb,
                               init_logger)

from test_engine import _build, _dataset


def test_named_loggers_write_thunder_log(tmp_path):
    path = init_logger(str(tmp_path))
    get_logger("ROUND").info("Round 1, test message")
    get_logger("MESH").warning("collective fallback")
    text = open(path).read()
    assert "[thunder.ROUND] Round 1, test message" in text
    assert "[thunder.MESH] collective fallback" in text
    assert host_rss_mb() > 10  # this process certainly exceeds 10 MB
    check_memory_usage("probe")
    assert "probe: RSS" in open(path).read()


def test_round_produces_observability_outputs(tmp_path):
    init_logger(str(tmp_path))
    vol, imgs, cp = _dataset(seed=21)
    opt = _build(make_mesh(), vol, imgs, cp)
    opt.para.output_directory = str(tmp_path)
    rec = opt.run_iteration()
    opt.save_outputs()

    # history carries stage wall clock and phase counts
    t = rec["timing"]
    assert {"expectation_scan", "expectation_search", "maximization_stats",
            "reconstruction"} <= set(t)
    assert all(v >= 0 for v in t.values())
    mean_ph, max_ph = rec["n_phase"]
    assert 1 <= mean_ph <= max_ph <= 100

    # SNR = FSC/(1-FSC); tau = padded-band reference power / 2
    assert opt.snr.shape == opt.fsc.shape
    good = opt.fsc < 1 - 1e-6
    np.testing.assert_allclose(
        opt.snr[good], opt.fsc[good] / (1 - opt.fsc[good]), rtol=1e-4)
    assert opt.tau.shape[1] == (opt.n // 2) * opt.para.pf
    assert np.all(opt.tau >= 0)

    # round dumps (reference file taxonomy)
    tag = f"Round_{opt.iteration:03d}"
    for name in (f"Timing_{tag}.txt", f"Sig_A_{tag}.txt", f"Sig_B_{tag}.txt",
                 f"Tau_A_{tag}.txt", f"Tau_B_{tag}.txt", f"FSC_{tag}.txt"):
        assert (tmp_path / name).exists(), name
    # FSC rows: "#####   1/resA   fsc" starting at shell 1
    first = open(tmp_path / f"FSC_{tag}.txt").readline().split()
    assert first[0] == "00001" and len(first) == 2 + opt.para.k
    # the run logged the round summary
    assert "Round 1 done" in open(tmp_path / "thunder.log").read()


def test_debug_nan_raises():
    """CHECK_NAN-equivalent: para.debug_nan flags a poisoned array with the
    stage name (reference include/Config.h NaN checks)."""
    import types

    import pytest

    from thunder_tpu.config import Para
    from thunder_tpu.core.optimiser import Optimiser

    ns = types.SimpleNamespace(para=Para(debug_nan=True),
                               log=get_logger("ROUND"), iteration=3)
    ok = {"t": np.zeros((2, 2))}
    Optimiser._check_nan(ns, "expectation", ok)  # finite: no raise
    bad = {"t": np.array([[1.0, np.nan]])}
    with pytest.raises(FloatingPointError, match="expectation"):
        Optimiser._check_nan(ns, "expectation", bad)
    ns.para.debug_nan = False
    Optimiser._check_nan(ns, "expectation", bad)  # disabled: no raise
