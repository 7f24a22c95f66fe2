import io
import json
import urllib.request
import zipfile

import numpy as np
import pytest

from eitx.core.errors import IngestError
from eitx.serve import EitxHTTPServer


class StubPipeline:
    def __init__(self):
        self.calls = []

    def _ok(self, name, blob):
        self.calls.append(name)
        data = blob.read()
        # raise like the real ingest on non-zip payloads
        if not data.startswith(b"PK"):
            raise IngestError("uploaded file is not a valid ZIP archive")
        return {"status": "success", "mode": name, "bytes": len(data)}

    def run_dicom_sequences_auto(self, b):
        return self._ok("auto", b)

    def run_dicom_sequences_custom(self, b):
        return self._ok("custom", b)

    def run_dicom_frame(self, b):
        return self._ok("frame", b)

    def run_jpg_png_zip(self, b):
        return self._ok("jpg", b)

    def run_nii(self, b):
        return self._ok("nii", b)


@pytest.fixture(scope="module")
def server():
    srv = EitxHTTPServer(StubPipeline(), host="127.0.0.1", port=0)
    srv.start_background()
    yield srv
    srv.shutdown()


def _zip_bytes():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("x.bin", b"data")
    return buf.getvalue()


def _post(server, path, body, content_type="application/octet-stream"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=body,
        headers={"Content-Type": content_type},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.mark.parametrize(
    "path,mode",
    [
        ("/uploadDicomSequence", "auto"),
        ("/uploadDicomSequenceCustom", "custom"),
        ("/uploadDicomFrame", "frame"),
        ("/uploadImageAxialSlice", "jpg"),
        ("/uploadNII", "nii"),
    ],
)
def test_endpoints_raw_body(server, path, mode):
    code, ans = _post(server, path, _zip_bytes())
    assert code == 200
    assert ans["mode"] == mode


def test_multipart_upload(server):
    blob = _zip_bytes()
    boundary = "xyzBOUNDARYxyz"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="a.zip"\r\n'
        "Content-Type: application/zip\r\n\r\n"
    ).encode() + blob + f"\r\n--{boundary}--\r\n".encode()
    code, ans = _post(
        server, "/uploadDicomFrame", body,
        content_type=f"multipart/form-data; boundary={boundary}",
    )
    assert code == 200
    assert ans["bytes"] == len(blob)


def test_bad_zip_maps_to_400(server):
    code, ans = _post(server, "/uploadNII", b"this is not a zip")
    assert code == 400
    assert "ZIP" in ans["detail"]


def test_unknown_endpoint_404(server):
    code, ans = _post(server, "/nope", b"")
    assert code == 404


def test_health(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/health") as r:
        ans = json.loads(r.read())
    assert ans["status"] == "ok"
    assert "/uploadNII" in ans["endpoints"]


def test_parse_multipart_extracts_payload():
    import io
    from eitx.serve.http import _LimitedReader, _parse_multipart_stream

    blob = b"PK\x03\x04payload"
    body = (
        b"--bb\r\nContent-Disposition: form-data; name=\"file\"; "
        b"filename=\"f\"\r\n\r\n" + blob + b"\r\n--bb--\r\n"
    )
    out = _parse_multipart_stream(
        _LimitedReader(io.BytesIO(body), len(body)),
        "multipart/form-data; boundary=bb",
    ).read()
    assert out == blob


def test_multipart_streaming_parser():
    """Chunk-straddling boundaries and a non-file first part must both
    parse; payload returned byte-exact without whole-body buffering."""
    import io
    from eitx.serve.http import _LimitedReader, _parse_multipart_stream

    boundary = "XbOuNdX"
    payload = bytes(range(256)) * 40000  # ~10 MB, crosses 1 MB read chunks
    body = (
        b"--XbOuNdX\r\n"
        b'Content-Disposition: form-data; name="comment"\r\n\r\n'
        b"not the file\r\n"
        b"--XbOuNdX\r\n"
        b'Content-Disposition: form-data; name="file"; filename="a.zip"\r\n'
        b"Content-Type: application/zip\r\n\r\n"
        + payload
        + b"\r\n--XbOuNdX--\r\n"
    )
    reader = _LimitedReader(io.BytesIO(body), len(body))
    spool = _parse_multipart_stream(
        reader, f"multipart/form-data; boundary={boundary}"
    )
    got = spool.read()
    assert got == payload

    # payload containing boundary-like bytes mid-stream must survive
    tricky = b"A" * 100 + b"\r\n--XbOuNd" + b"B" * 100  # near-marker prefix
    body2 = (
        b"--XbOuNdX\r\n"
        b'Content-Disposition: form-data; name="file"; filename="b"\r\n\r\n'
        + tricky
        + b"\r\n--XbOuNdX--\r\n"
    )
    reader2 = _LimitedReader(io.BytesIO(body2), len(body2))
    assert _parse_multipart_stream(
        reader2, f"multipart/form-data; boundary={boundary}"
    ).read() == tricky


def test_ui_page_served_and_consistent_with_routes(server):
    """/ui serves the built-in frontend (component 22: five-mode radio,
    drag-drop upload, client-side STORE-zip writer) and every endpoint
    the page's JS can POST to actually exists in the server's route
    table — the cross-consistency that would break silently if a route
    were renamed on one side only."""
    import re

    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/ui"
    ) as resp:
        assert resp.status == 200
        assert "text/html" in resp.headers.get("Content-Type", "")
        html = resp.read().decode()

    radios = re.findall(r'input type=radio name=mode value="([^"]+)"', html)
    assert len(radios) == 5  # the reference's five modes (front.py:52-242)
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/health"
    ) as resp:
        endpoints = set(json.loads(resp.read())["endpoints"])
    assert set(radios) <= endpoints, (set(radios) - endpoints)
    # client-side zip writer + custom_input.txt side channel present
    assert "makeZip" in html and "0x04034b50" in html
    assert "custom_input.txt" in html
