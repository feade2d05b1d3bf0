from rx_tools_tpu.utils.units import atofs, atoft, atofp, parse_kwargs


def test_atofs_suffixes():
    assert atofs("1k") == 1e3
    assert atofs("2.5M") == 2.5e6
    assert atofs("1G") == 1e9
    assert atofs("144390000") == 144390000.0
    assert atofs("88m") == 88e6
    assert atofs("125K") == 125e3


def test_atofs_plain_and_garbage():
    assert atofs("100") == 100.0
    assert atofs("") == 0.0
    assert atofs("12x") == 12.0   # unknown suffix -> atof semantics


def test_atoft():
    assert atoft("10") == 10.0
    assert atoft("30s") == 30.0
    assert atoft("5m") == 300.0
    assert atoft("1h") == 3600.0


def test_atofp():
    assert atofp("20%") == 0.2
    assert atofp("0.5") == 0.5


def test_parse_kwargs():
    assert parse_kwargs("LNA=40,VGA=20,AMP=0") == {"LNA": "40", "VGA": "20", "AMP": "0"}
    assert parse_kwargs("driver=rtlsdr") == {"driver": "rtlsdr"}
    assert parse_kwargs("stdin") == {"stdin": ""}
    assert parse_kwargs("") == {}
