"""Unit tests for the shared VSN_* gate env grammar (utils/flags.py).

Round-3 advisor finding: the gates parsed their env vars inconsistently —
`bool(int(env))` raised ValueError on VSN_STEM_IM2COL=false while the
relayout/glue gates accepted 0/false/off and treated '' as ON. One helper,
one grammar.
"""

import pytest

from vsn_tpu.utils.flags import env_flag


def test_unset_is_none(monkeypatch):
    monkeypatch.delenv("VSN_TEST_FLAG", raising=False)
    assert env_flag("VSN_TEST_FLAG") is None


@pytest.mark.parametrize("val", ["", "0", "false", "off", "no",
                                 "False", "OFF", " 0 "])
def test_falsy_values(monkeypatch, val):
    monkeypatch.setenv("VSN_TEST_FLAG", val)
    assert env_flag("VSN_TEST_FLAG") is False


@pytest.mark.parametrize("val", ["1", "true", "on", "yes", "2"])
def test_truthy_values(monkeypatch, val):
    monkeypatch.setenv("VSN_TEST_FLAG", val)
    assert env_flag("VSN_TEST_FLAG") is True


def test_gates_share_the_grammar(monkeypatch):
    from vsn_tpu.ops import window_relayout as wr

    monkeypatch.setenv("VSN_PALLAS_GLUE", "off")
    assert wr.glue_kernel_active() is False
    monkeypatch.setenv("VSN_PALLAS_GLUE", "1")
    assert wr.glue_kernel_active() is True
    monkeypatch.setenv("VSN_PALLAS_RELAYOUT", "false")
    assert wr.relayout_active() is False

    from vsn_tpu.ops.conv_unfold import _im2col_active

    # 'false' used to raise ValueError via bool(int(env))
    monkeypatch.setenv("VSN_STEM_IM2COL", "false")
    assert _im2col_active((1, 2, 2), (7, 7, 7), (3, 3, 3), 1) is False


def test_geometry_rejects_oversized_z_extent():
    from vsn_tpu.ops.stem_im2col import _geometry

    with pytest.raises(AssertionError, match="z-extent"):
        _geometry((16, 16, 16), (9, 3, 3), (1, 1, 1), (4, 1, 1))
