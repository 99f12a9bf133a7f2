"""Native TraX wire protocol (tracking/trax_protocol.py) + VOT trax mode.

The reference's trax-server branch needs the optional `trax` package
(vot.py:103-162, stub-covered in test_vot_trax.py). The native
implementation speaks the wire protocol itself, so here a scripted toolkit
CLIENT drives a REAL handshake over in-memory streams — including the full
track-vot CLI body with the protocol on stdout.
"""

import io

import numpy as np
import pytest

from ntm_tracker_tpu.tracking import vot
from ntm_tracker_tpu.tracking.trax_protocol import (
    TraxServer,
    format_message,
    parse_message,
)


class TestWireFormat:
    def test_round_trip_plain(self):
        line = format_message("frame", ["img0.jpg"])
        assert line == "@@TRAX:frame img0.jpg"
        assert parse_message(line) == ("frame", ["img0.jpg"], {})

    def test_round_trip_quoted_and_escaped(self):
        path = '/data/my seq/weird "name"\\img.jpg'
        mtype, args, props = parse_message(
            format_message("initialize", [path, "1.5,2,3,4"],
                           {"trax.name": "a b"})
        )
        assert (mtype, args) == ("initialize", [path, "1.5,2,3,4"])
        assert props == {"trax.name": "a b"}

    def test_non_protocol_lines_ignored(self):
        assert parse_message("some stray logging\n") is None
        assert parse_message("") is None
        assert parse_message("@@TRAX:") is None

    def test_properties_separated_from_args(self):
        mtype, args, props = parse_message(
            '@@TRAX:initialize "a.jpg" "10,10,5,5" trax.ignore=1\n'
        )
        assert mtype == "initialize"
        assert args == ["a.jpg", "10,10,5,5"]
        assert props == {"trax.ignore": "1"}

    def test_equals_in_filename_survives(self):
        """A legal image path containing '=' must stay a positional arg —
        quoting wins over the key=value property heuristic, both when the
        client quotes it and on our own serialize/parse round trip."""
        mtype, args, props = parse_message(
            '@@TRAX:frame "img=0.jpg"\n')
        assert (mtype, args, props) == ("frame", ["img=0.jpg"], {})
        line = format_message("initialize", ["seq=3/img.jpg", "1,2,3,4"])
        assert parse_message(line) == (
            "initialize", ["seq=3/img.jpg", "1,2,3,4"], {})

    def test_file_uri_stripped(self):
        fin = io.StringIO('@@TRAX:frame "file:///tmp/x.jpg"\n')
        server = TraxServer("rectangle", fin, io.StringIO())
        assert server.wait().image == "/tmp/x.jpg"


class TestTraxServerSession:
    def test_full_session(self):
        fin = io.StringIO(
            '@@TRAX:initialize "img0.jpg" "60,40,30,25"\n'
            "ignored non-protocol chatter\n"
            '@@TRAX:frame "img1.jpg"\n'
            "@@TRAX:quit\n"
        )
        fout = io.StringIO()
        server = TraxServer("rectangle", fin, fout)

        req = server.wait()
        assert (req.type, req.image, req.region) == (
            "initialize", "img0.jpg", "60,40,30,25")
        server.status(req.region)
        req = server.wait()
        assert (req.type, req.image) == ("frame", "img1.jpg")
        server.status("61,41,30,25")
        assert server.wait().type == "quit"
        server.quit()

        lines = fout.getvalue().splitlines()
        hello = parse_message(lines[0])
        assert hello[0] == "hello"
        assert hello[2]["trax.region"] == "rectangle"
        assert hello[2]["trax.image"] == "path"
        assert parse_message(lines[1]) == ("state", ["60,40,30,25"], {})
        assert parse_message(lines[2]) == ("state", ["61,41,30,25"], {})
        assert parse_message(lines[3])[0] == "quit"

    def test_eof_is_quit(self):
        server = TraxServer("rectangle", io.StringIO(""), io.StringIO())
        assert server.wait().type == "quit"


class TestVOTNativeTraxMode:
    def test_session_and_region_conversion(self):
        # polygon initialize under rectangle format -> bounding box
        # (reference vot.py convert_region semantics)
        fin = io.StringIO(
            '@@TRAX:initialize "f0.jpg" "0,0,10,0,10,20,0,20"\n'
            '@@TRAX:frame "f1.jpg"\n'
            "@@TRAX:quit\n"
        )
        fout = io.StringIO()
        handle = vot.VOT("rectangle", mode="trax", trax_streams=(fin, fout))
        region = handle.region()
        assert isinstance(region, vot.Rectangle)
        assert (region.x, region.y, region.width, region.height) == (
            0.0, 0.0, 10.0, 20.0)
        assert handle.frame() == "f0.jpg"
        assert handle.frame() == "f1.jpg"
        handle.report(vot.Rectangle(1, 2, 3, 4))
        assert handle.frame() is None
        handle.quit()
        out = [parse_message(l) for l in fout.getvalue().splitlines()]
        assert [m[0] for m in out] == ["hello", "state", "state", "quit"]
        assert out[1][1] == ["0.0,0.0,10.0,20.0"]  # initialize echo
        assert out[2][1] == ["1,2,3,4"]

    def test_quit_after_hello_is_clean_exit(self):
        """The toolkit probes trackers (or aborts) by quitting right after
        the hello — a clean zero-exit no-op session, not a RuntimeError."""
        fin = io.StringIO("@@TRAX:quit\n")
        fout = io.StringIO()
        with pytest.raises(SystemExit) as e:
            vot.VOT("rectangle", mode="trax", trax_streams=(fin, fout))
        assert e.value.code in (0, None)
        out = [parse_message(l) for l in fout.getvalue().splitlines()]
        assert [m[0] for m in out] == ["hello", "quit"]

    def test_eof_after_hello_is_clean_exit(self):
        fin = io.StringIO("")  # client hung up without a word
        fout = io.StringIO()
        with pytest.raises(SystemExit) as e:
            vot.VOT("rectangle", mode="trax", trax_streams=(fin, fout))
        assert e.value.code in (0, None)

    def test_trax_lib_mode_requires_package(self):
        if not vot.TRAX:
            with pytest.raises(RuntimeError, match="trax package"):
                vot.VOT("rectangle", mode="trax-lib")


class TestTrackVotTraxCLI:
    def test_cli_speaks_protocol_on_stdout(self, tmp_path, monkeypatch,
                                           capsys):
        """The full track-vot body in --vot_mode trax: a scripted toolkit
        client on stdin, the protocol (and ONLY the protocol) on stdout."""
        from PIL import Image

        from ntm_tracker_tpu.cli import build_parser

        rng = np.random.RandomState(1)
        paths = []
        for i in range(3):
            arr = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
            p = tmp_path / f"{i:08d}.jpg"
            Image.fromarray(arr).save(p)
            paths.append(str(p))

        script = (
            f'@@TRAX:initialize "{paths[0]}" "60,40,30,25"\n'
            f'@@TRAX:frame "{paths[1]}"\n'
            f'@@TRAX:frame "{paths[2]}"\n'
            "@@TRAX:quit\n"
        )
        monkeypatch.setattr("sys.stdin", io.StringIO(script))
        args = build_parser().parse_args([
            "track-vot", "--mem_size", "16", "--mem_dim", "8",
            "--hidden_size", "24", "--read_head_size", "2",
            "--vot_mode", "trax", "--workdir", str(tmp_path),
        ])
        assert args.fn(args) == 0

        captured = capsys.readouterr()
        msgs = [parse_message(l) for l in captured.out.splitlines()]
        assert None not in msgs, "stray non-protocol output on stdout"
        kinds = [m[0] for m in msgs]
        # hello, initialize echo, one state per tracked frame, quit
        assert kinds == ["hello", "state", "state", "state", "quit"]
        for m in msgs[2:4]:  # tracked-frame states are x,y,w,h floats
            assert len(m[1][0].split(",")) == 4
        assert "tracked 3 frames" in captured.err


class TestNewlineRejection:
    def test_newline_in_token_is_rejected(self):
        """Line-framed protocol: a '\n' inside a token cannot be escaped,
        so serialization must fail loudly instead of splitting the message
        across two physical lines (trax_protocol._quote)."""
        with pytest.raises(ValueError, match="newline"):
            format_message("frame", ["bad\nname.jpg"])
        with pytest.raises(ValueError, match="newline"):
            format_message("initialize", ["img.jpg"], {"k": "a\rb"})
