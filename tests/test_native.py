"""Native codec: pack/unpack round-trip + libstdc++ mt19937 text format."""

import numpy as np

from procgen_tpu.utils import native_codec


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    num = 5
    leaves = [
        rng.randint(0, 2**31, size=(num, 7)).astype(np.int32),
        rng.rand(num, 3, 4).astype(np.float32),
        rng.rand(num) > 0.5,
    ]
    blobs = native_codec.pack_states([l.copy() for l in leaves], num)
    assert len(blobs) == num
    assert blobs[0][:8] == b"PGTPU001"
    out = [np.zeros_like(l) for l in leaves]
    native_codec.unpack_states(blobs, out, num)
    for a, b in zip(leaves, out):
        np.testing.assert_array_equal(a, b)


def test_mt19937_text_matches_libstdcpp():
    # golden: std::mt19937 seeded with 42 after 0 draws, printed via <<
    import subprocess, tempfile, os, textwrap

    src = textwrap.dedent(
        """
        #include <random>
        #include <sstream>
        #include <cstdio>
        int main() {
            std::mt19937 g(42);
            std::ostringstream os;
            os << g;
            printf("%s", os.str().c_str());
        }
        """
    )
    with tempfile.TemporaryDirectory() as td:
        cpp = os.path.join(td, "m.cpp")
        exe = os.path.join(td, "m")
        open(cpp, "w").write(src)
        subprocess.run(["g++", "-O1", "-o", exe, cpp], check=True)
        want = subprocess.run([exe], capture_output=True, text=True).stdout

    # same state from our seeding + text writer
    from procgen_tpu.utils.host_mt import HostMT19937

    h = HostMT19937(42)
    got = native_codec.mt19937_to_text(np.array(h.mt, np.uint32), h.pos)
    assert got == want

    mt, pos = native_codec.mt19937_from_text(got)
    np.testing.assert_array_equal(mt, np.array(h.mt, np.uint32))
    assert pos == h.pos
