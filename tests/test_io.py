import numpy as np

from thunder_tpu.io import mrc, thu


def test_mrc_roundtrip_volume(tmp_path, rng):
    vol = rng.normal(size=(16, 16, 16)).astype(np.float32)
    path = str(tmp_path / "v.mrc")
    mrc.write_mrc(path, vol, voxel_size=1.32)
    back, hdr = mrc.read_mrc(path, return_header=True)
    np.testing.assert_array_equal(back, vol)
    assert hdr.mode == 2
    np.testing.assert_allclose(hdr.voxel_size, 1.32, rtol=1e-6)


def test_mrc_stack_slices(tmp_path, rng):
    stack = rng.normal(size=(10, 8, 8)).astype(np.float32)
    path = str(tmp_path / "s.mrcs")
    mrc.write_mrc(path, stack)
    got = mrc.read_stack_slices(path, [3, 7, 0])
    np.testing.assert_array_equal(got[0], stack[3])
    np.testing.assert_array_equal(got[1], stack[7])
    np.testing.assert_array_equal(got[2], stack[0])


def test_particle_path_parse():
    assert mrc.parse_particle_path("5@stack.mrcs") == (4, "stack.mrcs")
    assert mrc.parse_particle_path("plain.mrc") == (0, "plain.mrc")


def test_thu_roundtrip(tmp_path, rng):
    n = 5
    table = thu.make_table(
        n,
        particle_paths=[f"{i+1}@s.mrcs" for i in range(n)],
        defocus_u=rng.uniform(10000, 30000, n),
        defocus_v=rng.uniform(10000, 30000, n),
        score=rng.uniform(0, 1, n),
    )
    path = str(tmp_path / "m.thu")
    thu.write_thu(path, table)
    back = thu.read_thu(path)
    assert len(back) == n
    np.testing.assert_allclose(
        back.col(thu.ThuColumns.DEFOCUS_U),
        table.col(thu.ThuColumns.DEFOCUS_U),
        rtol=1e-9,
    )
    assert back.particle_paths == table.particle_paths
    # quaternion default identity
    np.testing.assert_allclose(back.col(thu.ThuColumns.QUAT_0), 1.0)
