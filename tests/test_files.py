"""File-level API: segment chaining, CLI paths, sharded file mode."""

import json
import os

import numpy as np
import pytest

from mhc_tpu import api
from mhc_tpu.cli import main as cli_main
from tests.corpus import english_like, mixed_binary


@pytest.fixture
def tmpfiles(tmp_path):
    def mk(name, data):
        p = tmp_path / name
        p.write_bytes(data)
        return str(p)
    return mk, tmp_path


def test_segment_chaining_roundtrip(tmpfiles):
    mk, tmp = tmpfiles
    data = mixed_binary(700_000, seed=31)
    src = mk("in.bin", data)
    dst = str(tmp / "out.mhc")
    back = str(tmp / "back.bin")
    rep = api.compress_file(src, dst, segment_size=200_000)
    assert rep["n_segments"] == 4
    rep2 = api.decompress_file(dst, back)
    assert rep2["n_segments"] == 4
    assert open(back, "rb").read() == data


def test_single_segment_file(tmpfiles):
    mk, tmp = tmpfiles
    data = english_like(100_000, seed=32)
    src = mk("in.bin", data)
    dst = str(tmp / "out.mhc")
    back = str(tmp / "back.bin")
    api.compress_file(src, dst)
    api.decompress_file(dst, back)
    assert open(back, "rb").read() == data


def test_empty_file(tmpfiles):
    mk, tmp = tmpfiles
    src = mk("in.bin", b"")
    dst = str(tmp / "out.mhc")
    back = str(tmp / "back.bin")
    rep = api.compress_file(src, dst)
    assert rep["n_segments"] == 1
    api.decompress_file(dst, back)
    assert open(back, "rb").read() == b""


def test_sharded_file_mode(tmpfiles):
    from mhc_tpu.parallel import mesh as meshmod
    mk, tmp = tmpfiles
    data = english_like(300_000, seed=33)
    src = mk("in.bin", data)
    dst = str(tmp / "out.mhc")
    back = str(tmp / "back.bin")
    m = meshmod.make_mesh(8)
    api.compress_file(src, dst, sharded=True, mesh=m,
                      segment_size=150_000)
    api.decompress_file(dst, back, sharded=True, mesh=m)
    assert open(back, "rb").read() == data


def test_cli_segmented_roundtrip(tmpfiles, capsys):
    mk, tmp = tmpfiles
    data = english_like(250_000, seed=34)
    src = mk("in.bin", data)
    dst = str(tmp / "out.mhc")
    back = str(tmp / "back.bin")
    rc = cli_main(["encode", "--segment-size", "100K", "--report",
                   src, dst])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["n_segments"] == 3
    rc = cli_main(["decode", "--report", dst, back])
    assert rc == 0
    assert open(back, "rb").read() == data
