import math

from centroflye_tpu.config import CentroFlyeConfig, RecruitmentConfig


def test_json_roundtrip():
    cfg = CentroFlyeConfig(coverage=17).replace(
        recruitment=RecruitmentConfig(threshold=550, prefilter=False))
    back = CentroFlyeConfig.from_json(cfg.to_json())
    assert back == cfg
    assert back.recruitment.threshold == 550
    assert back.recruitment.prefilter is False


def test_inf_roundtrip():
    cfg = CentroFlyeConfig()
    assert cfg.polisher.max_pos == math.inf
    back = CentroFlyeConfig.from_json(cfg.to_json())
    assert back.polisher.max_pos == math.inf


def test_cen6_preset():
    cfg = CentroFlyeConfig.cen6()
    assert cfg.recruitment.threshold == 550
    assert cfg.coverage == 120


def test_unknown_key_rejected():
    import pytest
    with pytest.raises(KeyError):
        CentroFlyeConfig.from_json('{"nonsense": 1}')
