"""Golden-byte pins for every HDF5 object-header message the native
writer emits (VERDICT r8 #3).

The round-8 chunked-layout byte-order bug (B-tree address written
before the dimensionality field) survived round-trip testing because a
symmetric encode/decode swap is self-consistent; only an external spec
read caught it. These constants are transcribed FIELD BY FIELD from
the public HDF5 File Format Specification (v0 superblock era
structures: spec section IV.A.2 message catalogue), so a refactor that
re-introduces a self-consistent-but-nonconformant encoding fails here
even though round-trips stay green.

No attribute-message (0x000C) golden: the writer never emits one —
scalar metadata rides as datasets (sources_hdf5.py module docstring).
"""

from __future__ import annotations

import struct

import numpy as np

from mwa_uvdata_pipeline_spark.sources_hdf5 import (
    _Buf,
    _dataset_oh,
    _dtype_message,
    _message,
    _object_header,
)


def _hx(s: str) -> bytes:
    return bytes.fromhex(s.replace(" ", ""))


class TestDatatypeMessageGoldens:
    """Datatype message (0x0003) bodies — spec IV.A.2.d."""

    def test_int64(self):
        # ver1|class0 fixed-point, bits0=0x08 (bit3: signed 2's
        # complement; bit0=0: little-endian), size 8; properties:
        # bit offset 0, bit precision 64
        assert _dtype_message(np.dtype("<i8")) == _hx(
            "10 08 0000 08000000 0000 4000"
        )

    def test_uint8(self):
        assert _dtype_message(np.dtype("<u1")) == _hx(
            "10 00 0000 01000000 0000 0800"
        )

    def test_float64(self):
        # ver1|class1 float, bits0=0x20 (mantissa normalization 2 =
        # implied MSB; bit0=0 LE), sign location 63, size 8;
        # properties: bit offset 0, precision 64, exponent location
        # 52, exponent size 11, mantissa location 0, mantissa size 52,
        # exponent bias 1023 — exactly H5T_IEEE_F64LE
        assert _dtype_message(np.dtype("<f8")) == _hx(
            "11 20 3f 00 08000000 0000 4000 34 0b 00 34 ff030000"
        )

    def test_float32(self):
        # sign 31, precision 32, exp@23 size 8, mant@0 size 23, bias 127
        assert _dtype_message(np.dtype("<f4")) == _hx(
            "11 20 1f 00 04000000 0000 2000 17 08 00 17 7f000000"
        )

    def test_fixed_string(self):
        # ver1|class3 string, bits0=0x01 (null-padded, ASCII), size 4
        assert _dtype_message(np.dtype("S4")) == _hx("13 01 0000 04000000")

    def test_complex128_compound(self):
        # ver1|class6 compound, 2 members, size 16; each member (v1):
        # name nul-terminated padded to 8, byte offset u32,
        # dimensionality u8 + 3 reserved, dim permutation u32,
        # reserved u32, 4 dim sizes u32, then the member's base
        # datatype message (float64 golden above)
        f64 = "11203f000800000000004000340b0034ff030000"
        member = "{name}{pad} {off} 00 000000 00000000 00000000 " + (
            "00000000" * 4
        )
        r = member.format(name="72", pad="00" * 7, off="00000000") + f64
        i = member.format(name="69", pad="00" * 7, off="08000000") + f64
        assert _dtype_message(np.dtype("<c16")) == _hx(
            "16 02 0000 10000000" + r + i
        )


class TestHeaderFramingGoldens:
    def test_message_wrapper(self):
        # v1 header message: type u16, body size u16 (8-padded),
        # flags u8, 3 reserved, body
        assert _message(0x0008, b"\x01\x02\x03") == _hx(
            "0800 0800 00 000000 0102030000000000"
        )

    def test_object_header_prologue(self):
        # v1 object header: version 1, reserved, message count u16,
        # reference count u32, header block size u32, then 4 pad bytes
        # so the first message starts 8-aligned
        oh = _object_header([_message(0x0011, struct.pack("<QQ", 16, 32))])
        assert oh == _hx(
            "01 00 0100 01000000 18000000 00000000"
            # symbol-table message (0x0011): btree addr, heap addr
            "1100 1000 00 000000 1000000000000000 2000000000000000"
        )


class TestDatasetObjectHeaderGoldens:
    """Full dataset object headers: dataspace (0x0001) + datatype
    (0x0003) + [filter pipeline (0x000B)] + layout (0x0008)."""

    def test_contiguous_int64_2x3(self):
        buf = _Buf()
        addr = _dataset_oh(buf, np.arange(6, dtype="<i8").reshape(2, 3))
        assert bytes(buf.b[addr:]) == _hx(
            # object header: 3 messages, block size 0x58
            "01 00 0300 01000000 58000000 00000000"
            # dataspace v1: rank 2, flags 0, 5 reserved, dims 2,3 (u64)
            "0100 1800 00 000000"
            "01 02 00 00 00000000 0200000000000000 0300000000000000"
            # datatype int64 (pinned above)
            "0300 1000 00 000000 100800000800000000004000 00000000"
            # layout v3 class1 contiguous: raw address 0 (first alloc
            # in this buf), size 48 bytes, then 8-pad
            "0800 1800 00 000000"
            "03 01 0000000000000000 3000000000000000 000000000000"
        )

    def test_chunked_int64_4x1(self):
        buf = _Buf()
        addr = _dataset_oh(
            buf, np.arange(4, dtype="<i8").reshape(4, 1), chunk=(2, 1)
        )
        assert bytes(buf.b[addr:]) == _hx(
            "01 00 0400 01000000 78000000 00000000"
            # dataspace v1: rank 2, dims 4,1
            "0100 1800 00 000000"
            "01 02 00 00 00000000 0400000000000000 0100000000000000"
            # datatype int64
            "0300 1000 00 000000 100800000800000000004000 00000000"
            # filter pipeline v1: 1 filter, 2+4 reserved; filter id 1
            # (deflate), name len 0, flags 0 (mandatory), 1 client
            # value (aggression 6), odd count → 4-byte pad
            "0b00 1800 00 000000"
            "01 01 0000 00000000 0100 0000 0000 0100 06000000 00000000"
            # layout v3 class2 chunked — SPEC ORDER (the r8 bug):
            # version, class, dimensionality=rank+1, THEN the B-tree
            # address, then dim sizes u32 (2,1) + element size u32 (8)
            "0800 1800 00 000000"
            "03 02 03 2000000000000000 02000000 01000000 08000000 00"
        )

    def test_chunk_btree_node_key_order(self):
        """v1 B-tree node (type 1, raw-data chunks): each key is
        (chunk byte size u32, filter mask u32, offsets u64 per dim +
        one element-offset 0), keys alternate with child pointers, and
        the FINAL key is one-past-the-end in every dimension."""
        import zlib

        from mwa_uvdata_pipeline_spark.sources_hdf5 import _chunk_btree

        buf = _Buf()
        arr = np.arange(4, dtype="<i8").reshape(4, 1)
        taddr = _chunk_btree(buf, arr, (2, 1))
        c0 = zlib.compress(arr[:2].tobytes())
        c1 = zlib.compress(arr[2:].tobytes())
        node = bytes(buf.b[taddr:])
        want = (
            b"TREE"
            + struct.pack("<BBHQQ", 1, 0, 2, 2**64 - 1, 2**64 - 1)
            # key 0: size of chunk 0, mask 0, offsets (0,0), elem 0
            + struct.pack("<IIQQQ", len(c0), 0, 0, 0, 0)
            + struct.pack("<Q", 0)  # child 0: chunk 0 at buf start
            + struct.pack("<IIQQQ", len(c1), 0, 2, 0, 0)
            + struct.pack("<Q", (len(c0) + 7) // 8 * 8)  # 8-aligned
            # final key: one past the end (4,1), elem 0
            + struct.pack("<IIQQQ", 0, 0, 4, 1, 0)
        )
        assert node == want
