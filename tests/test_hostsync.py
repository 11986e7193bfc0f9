"""utils/hostsync + fused pack/unpack round trips.

These carriers exist because the relay charges a round trip per
transferred array (see utils/hostsync.py); correctness is exact
reconstruction of shapes, dtypes and values through the single packed
f32 buffer.
"""

import jax.numpy as jnp
import numpy as np

from vio360_tpu.estimator import fused
from vio360_tpu.utils import hostsync


def test_fetch_tree_round_trips_structure_and_dtypes():
    tree = {
        "a": jnp.asarray([[1.5, -2.25], [0.0, 3.75]], jnp.float32),
        "b": (jnp.asarray([7, -3, 2], jnp.int32), jnp.asarray(True)),
        "c": jnp.asarray(4.5, jnp.float32),
        "d": jnp.asarray([True, False, True]),
    }
    out = hostsync.fetch_tree(tree)
    assert isinstance(out["a"], np.ndarray) and out["a"].dtype == np.float32
    np.testing.assert_array_equal(out["a"], np.asarray(tree["a"]))
    assert out["b"][0].dtype == np.int32
    np.testing.assert_array_equal(out["b"][0], [7, -3, 2])
    assert bool(out["b"][1]) is True
    assert float(out["c"]) == 4.5
    np.testing.assert_array_equal(out["d"], [True, False, True])


def test_fetch_tree_empty():
    assert hostsync.fetch_tree({}) == {}


def test_fetch_tree_large_ints_exact():
    """Ints beyond the f32 mantissa (>= 2^24) must round-trip exactly
    through the bitcast carrier — e.g. frame ids in a long-lived
    serving stream."""
    big = np.asarray([2**24 + 1, -(2**24 + 3), 2**31 - 1, -(2**31)], np.int32)
    out = hostsync.fetch_tree({"ids": jnp.asarray(big)})
    assert out["ids"].dtype == np.int32
    np.testing.assert_array_equal(out["ids"], big)


def test_fetch_tree_x64_leaves():
    """Under x64 semantics (--x64 double-precision mode), float64
    leaves ride the carrier as a double-float (hi, lo) pair — the
    round trip must preserve ~49 mantissa bits, far tighter than plain
    f32 truncation — and int64 leaves narrow exactly through int32.
    Runs in a subprocess because JAX_ENABLE_X64 is process-global."""
    import os
    import subprocess
    import sys

    code = (
        "import numpy as np\n"
        "import jax.numpy as jnp\n"
        "from vio360_tpu.utils import hostsync\n"
        "v = np.asarray([1.0 + 2**-40, -12345.6789012345, 3e7], np.float64)\n"
        "out = hostsync.fetch_tree({'x': jnp.asarray(v, jnp.float64),\n"
        "                           'i': jnp.asarray([2**24 + 7], jnp.int64)})\n"
        "assert out['x'].dtype == np.float64\n"
        "rel = np.max(np.abs(out['x'] - v) / np.abs(v))\n"
        "assert rel < 1e-13, rel\n"
        "assert int(out['i'][0]) == 2**24 + 7\n"
        "print('X64_CARRIER_OK')\n"
    )
    env = dict(os.environ, JAX_ENABLE_X64="true", JAX_PLATFORMS="cpu")
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert "X64_CARRIER_OK" in res.stdout, (res.stdout, res.stderr)


def test_frame_input_pack_unpacks_in_graph():
    """pack_frame_input's layout must match tracking_step's in-graph
    unpack (same slicing arithmetic, replicated here)."""
    cap, w, h = 8, 64, 32
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (h, w)).astype(np.float32)
    rows = rng.standard_normal((5, 7))
    buf = fused.pack_frame_input(img, 12.25, rows, cap, w, frame_id=42)
    np.testing.assert_array_equal(buf[:h], img)
    aux = buf[h:].ravel()
    assert aux[0] == np.float32(12.25)
    assert aux[1] == 42.0
    assert aux[2] == 1.0
    got = aux[3:3 + 5 * 7].reshape(5, 7)
    np.testing.assert_allclose(got, rows.astype(np.float32), rtol=1e-6)
    mask = aux[3 + cap * 7:3 + cap * 8] > 0.5
    assert mask[:5].all() and not mask[5:].any()
    # no IMU rows
    buf2 = fused.pack_frame_input(img, 1.0, None, cap, w)
    assert buf2[h:].ravel()[2] == 0.0


def test_kf_record_pack_unpack_round_trip():
    max_kf = 4
    k = max_kf
    rng = np.random.default_rng(1)
    rec_len = 8 + 9 + 3 + k + 9 * k + 3 * k + 3 + 27 + 9 + 3 + 12 + 22
    rec = rng.standard_normal(rec_len).astype(np.float32)
    rec[0:8] = [2.5, 17, 5, 0, 100, 12, 1.0, 1.02]
    out = fused.unpack_kf_record(rec, max_kf)
    assert out["ba_cost"] == np.float32(2.5)
    assert out["ba_inliers"] == 17 and out["n_new"] == 5
    assert out["refine_applied"] is True and abs(out["refine_s"] - 1.02) < 1e-6
    assert out["kf_r"].shape == (k, 3, 3) and out["kf_t"].shape == (k, 3)
    assert out["cap_kf_r"].shape == (3, 3, 3)
    assert out["pair_w"].shape == (2, 6)
    assert out["imu_edge"]["dr"].shape == (3, 3)
    # offsets consumed the whole record exactly
    o = 8 + 9 + 3 + k + 9 * k + 3 * k + 3 + 27 + 9 + 3 + 12 + 22
    assert o == rec_len


def test_kf_aux_pack():
    buf = fused.pack_kf_input(3.5, 42, 6, True, False,
                              np.ones((4, 7)), cap=16)
    assert buf[0] == np.float32(3.5) and buf[1] == 42
    assert buf[2] == 6 and buf[3] == 1.0 and buf[4] == 0.0 and buf[5] == 4
    assert buf[fused.KF_AUX_LEN:fused.KF_AUX_LEN + 28].sum() == 28
