"""Property-based round-trip tests (hypothesis) for every block codec and
varint: arbitrary byte strings must survive compress->uncompress bit-exact
for rANS4x8, rANSNx16, adaptive arithmetic, fqzcomp and tok3, and the
ITF8/LTF8/uint7 varints must round-trip over their full domains.  These
complement the fixed-case tests with adversarial shapes (runs, high
entropy, tiny/empty inputs) the fixed cases may miss."""

import numpy as np
from hypothesis import given, settings, strategies as st

from hla_la_tpu.io import arith, fqzcomp, rans, rans_nx16, tok3

_bytes = st.binary(min_size=0, max_size=4096)
_small = st.binary(min_size=0, max_size=512)
# low-entropy payloads exercise RLE/PACK and the carry paths
_runs = st.lists(
    st.tuples(st.integers(0, 255), st.integers(1, 200)),
    min_size=0, max_size=40,
).map(lambda rs: b"".join(bytes([v]) * n for v, n in rs))


@settings(max_examples=40, deadline=None)
@given(st.one_of(_bytes, _runs), st.sampled_from([0, 1]))
def test_rans4x8_round_trip_prop(data, order):
    assert rans.uncompress(rans.compress(data, order)) == data


@settings(max_examples=40, deadline=None)
@given(st.one_of(_bytes, _runs), st.sampled_from([0, 1]),
       st.booleans(), st.booleans(), st.booleans())
def test_rans_nx16_round_trip_prop(data, order, n32, use_pack, use_rle):
    blob = rans_nx16.compress(data, order=order, n32=n32,
                              use_pack=use_pack, use_rle=use_rle)
    assert rans_nx16.uncompress(blob) == data


@settings(max_examples=40, deadline=None)
@given(st.one_of(_small, _runs), st.sampled_from([0, 1]),
       st.booleans(), st.booleans(), st.booleans())
def test_arith_round_trip_prop(data, order, use_pack, use_rle, ext):
    blob = arith.compress(data, order=order, use_pack=use_pack,
                          use_rle=use_rle, ext=ext)
    assert arith.uncompress(blob) == data


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(1, 300), min_size=0, max_size=20),
       st.integers(0, 60))
def test_fqzcomp_round_trip_prop(lens, span):
    rng = np.random.default_rng(span)
    data = b"".join(
        bytes((33 + rng.integers(0, max(1, span + 1), ln)).astype(np.uint8))
        for ln in lens)
    blob = fqzcomp.compress(data, lens or None)
    assert fqzcomp.uncompress(blob, len(data)) == data


_name_char = st.integers(1, 255).filter(lambda c: c != 10).map(chr)
_names = st.lists(
    st.text(alphabet=_name_char, min_size=0, max_size=40),
    min_size=0, max_size=30)


@settings(max_examples=40, deadline=None)
@given(_names, st.booleans(), st.booleans())
def test_tok3_round_trip_prop(names, use_arith, trailing):
    data = "\n".join(names).encode("latin-1")
    if trailing and names:
        data += b"\n"
    blob = tok3.compress(data, use_arith=use_arith)
    assert tok3.uncompress(blob) == data


@settings(max_examples=60, deadline=None)
@given(st.integers(-(1 << 31), (1 << 31) - 1))
def test_itf8_round_trip_prop(v):
    from hla_la_tpu.io.cram import read_itf8, write_itf8
    got, pos = read_itf8(write_itf8(v), 0)
    assert got == v


@settings(max_examples=60, deadline=None)
@given(st.integers(0, (1 << 63) - 1))
def test_ltf8_round_trip_prop(v):
    from hla_la_tpu.io.cram import read_ltf8, write_ltf8
    got, pos = read_ltf8(write_ltf8(v), 0)
    assert got == v


@settings(max_examples=60, deadline=None)
@given(st.integers(0, (1 << 62) - 1))
def test_uint7_round_trip_prop(v):
    out = bytearray()
    rans_nx16.write_uint7(v, out)
    got, pos = rans_nx16.read_uint7(bytes(out), 0)
    assert got == v and pos == len(out)
