"""tracking/vot.py trax-server branch, exercised against a scripted stub of
the trax package (reference vot.py:103-162). File mode is covered in
test_tracking.py; this covers the other half of the protocol handle."""

import types

import pytest

from ntm_tracker_tpu.tracking import vot


class _StubRegion:
    def __init__(self, type_, **kw):
        self.type = type_
        self.__dict__.update(kw)


class _StubRequest:
    def __init__(self, type_, region=None, image=None):
        self.type = type_
        self.region = region
        self.image = image


class _StubServer:
    """Scripted trax server: initialize -> N frames -> quit request."""

    def __init__(self, options, script):
        self.options = options
        self._script = list(script)
        self.statuses = []
        self.quit_called = False

    def wait(self):
        return self._script.pop(0)

    def status(self, region):
        self.statuses.append(region)

    def quit(self):
        self.quit_called = True


def _make_stub_trax(script):
    """Build module objects matching the names vot.py touches."""
    created = {}

    stub = types.ModuleType("trax")
    stub.image = types.SimpleNamespace(PATH="path")
    stub.region = types.SimpleNamespace(
        Rectangle=lambda x, y, w, h: ("rect", x, y, w, h),
        Polygon=lambda pts: ("poly", tuple(pts)),
    )
    server_mod = types.ModuleType("trax.server")

    def server_options(region_format, image_format):
        return (region_format, image_format)

    def server(options):
        created["server"] = _StubServer(options, script)
        return created["server"]

    server_mod.ServerOptions = server_options
    server_mod.Server = server
    stub.server = server_mod
    return stub, created


@pytest.fixture
def trax_env(monkeypatch):
    def install(script):
        stub, created = _make_stub_trax(script)
        monkeypatch.setattr(vot, "trax", stub, raising=False)
        monkeypatch.setattr(vot, "TRAX", True)
        return created

    yield install
    # monkeypatch auto-restores TRAX/trax afterwards


def test_trax_rectangle_session(trax_env):
    init = _StubRequest(
        "initialize",
        region=_StubRegion("rectangle", x=10.0, y=20.0, width=30.0, height=40.0),
        image="frame0.jpg",
    )
    script = [
        init,
        _StubRequest("frame", image="frame1.jpg"),
        _StubRequest("quit"),
    ]
    created = trax_env(script)

    handle = vot.VOT("rectangle")
    server = created["server"]
    # ServerOptions got the requested format + PATH images
    assert server.options == ("rectangle", "path")
    # the initialize region surfaces through region()
    assert handle.region() == vot.Rectangle(10.0, 20.0, 30.0, 40.0)
    # initialize echoes the region back as the first status
    assert server.statuses == [init.region]

    # first frame() returns the image delivered with initialize
    assert handle.frame() == "frame0.jpg"
    handle.report(vot.Rectangle(11.0, 21.0, 30.0, 40.0))
    assert server.statuses[-1] == ("rect", 11.0, 21.0, 30.0, 40.0)

    assert handle.frame() == "frame1.jpg"
    handle.report(vot.Polygon([vot.Point(0.0, 0.0), vot.Point(1.0, 0.0),
                               vot.Point(1.0, 1.0)]))
    assert server.statuses[-1] == ("poly", ((0.0, 0.0), (1.0, 0.0), (1.0, 1.0)))

    # non-frame request ends the sequence
    assert handle.frame() is None
    handle.quit()
    assert server.quit_called
    del handle._trax  # keep __del__ from double-quitting after restore


def test_trax_polygon_initialize(trax_env):
    init = _StubRequest(
        "initialize",
        region=_StubRegion("polygon", points=[(0.0, 1.0), (2.0, 1.0), (2.0, 3.0)]),
        image="f0.jpg",
    )
    created = trax_env([init, _StubRequest("quit")])
    handle = vot.VOT("polygon")
    assert handle.region() == vot.Polygon(
        [vot.Point(0.0, 1.0), vot.Point(2.0, 1.0), vot.Point(2.0, 3.0)]
    )
    assert handle.frame() == "f0.jpg"
    assert handle.frame() is None
    handle.quit()
    assert created["server"].quit_called
    del handle._trax
