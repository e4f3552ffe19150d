"""Link-resolver unit tests with mocked HTTP (VERDICT r2 item 7).

Covers the reference front-door flows (rvc/lib/tools/model_download.py:37-196
+ vendored gdown.py): Drive share link -> uc?id -> confirm interstitial ->
file; HF /blob/ rewrite; /tree/main zip scrape; zip-of-pth+index install.
"""

import io
import os
import zipfile

import pytest

from rvc_tpu.utils.link_resolver import (
    LinkResolveError,
    download_link,
    filename_from_headers,
    gdrive_confirm_url,
    parse_gdrive_id,
    scrape_zip_link,
    search_pth_index,
)


class FakeResponse:
    def __init__(self, content=b"", headers=None, status_code=200, text=None):
        self.content = content
        self.headers = headers or {}
        self.status_code = status_code
        self._text = text

    @property
    def text(self):
        return self._text if self._text is not None else self.content.decode()

    def iter_content(self, chunk_size=1):
        yield self.content


def make_get(routes):
    calls = []

    def get(url, stream=True):
        calls.append(url)
        for prefix, resp in routes.items():
            if url.startswith(prefix):
                return resp() if callable(resp) else resp
        return FakeResponse(status_code=404)

    get.calls = calls
    return get


def test_parse_gdrive_id_shapes():
    assert parse_gdrive_id(
        "https://drive.google.com/file/d/FILE123/view?usp=sharing"
    ) == "FILE123"
    assert parse_gdrive_id(
        "https://drive.google.com/uc?id=ABC&export=download") == "ABC"
    assert parse_gdrive_id(
        "https://drive.google.com/open?id=XYZ") == "XYZ"
    assert parse_gdrive_id("https://example.com/file/d/NOPE/view") is None


def test_gdrive_confirm_url_patterns():
    html_href = '<a href="/uc?export=download&amp;confirm=TOK&amp;id=F1">ok</a>'
    assert gdrive_confirm_url(html_href) == (
        "https://docs.google.com/uc?export=download&confirm=TOK&id=F1"
    )
    html_form = (
        '<form action="https://drive.usercontent.google.com/download" '
        'method="get"><input type="hidden" name="id" value="F2">'
        '<input type="hidden" name="confirm" value="t">'
        '<input type="hidden" name="uuid" value="U2"></form>'
    )
    assert gdrive_confirm_url(html_form) == (
        "https://drive.usercontent.google.com/download?id=F2&confirm=t&uuid=U2"
    )
    html_json = '{"downloadUrl":"https://x/y?a\\u003d1\\u0026b\\u003d2"}'
    assert gdrive_confirm_url(html_json) == "https://x/y?a=1&b=2"
    with pytest.raises(LinkResolveError, match="quota"):
        gdrive_confirm_url('<p class="uc-error-subcaption">quota</p>')


def test_drive_confirm_dance(tmp_path):
    """share link -> uc?id (HTML interstitial) -> confirmed URL -> bytes."""
    interstitial = (
        '<form action="https://drive.usercontent.google.com/download">'
        '<input type="hidden" name="id" value="FILE123">'
        '<input type="hidden" name="confirm" value="t">'
        '<input type="hidden" name="uuid" value="UU"></form>'
    )
    get = make_get({
        "https://drive.google.com/uc?id=FILE123": FakeResponse(
            content=interstitial.encode(),
            headers={"Content-Type": "text/html; charset=utf-8"},
        ),
        "https://drive.usercontent.google.com/download?id=FILE123":
            FakeResponse(
                content=b"MODELBYTES",
                headers={
                    "Content-Type": "application/octet-stream",
                    "Content-Disposition": 'attachment; filename="m.pth"',
                },
            ),
    })
    path = download_link(
        "https://drive.google.com/file/d/FILE123/view?usp=sharing",
        str(tmp_path), http_get=get,
    )
    assert os.path.basename(path) == "m.pth"
    assert open(path, "rb").read() == b"MODELBYTES"
    assert get.calls[0].startswith("https://drive.google.com/uc?id=FILE123")


def test_hf_blob_rewrite(tmp_path):
    get = make_get({
        "https://huggingface.co/u/m/resolve/main/model.pth": FakeResponse(
            content=b"PTH", headers={"Content-Type": "application/octet-stream"}
        ),
    })
    path = download_link(
        "https://huggingface.co/u/m/blob/main/model.pth",
        str(tmp_path), http_get=get,
    )
    assert path.endswith("model.pth") and open(path, "rb").read() == b"PTH"


def test_hf_tree_scrape_and_zip(tmp_path):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("voice.pth", b"P")
        z.writestr("voice.index", b"I")
    page = '<a href="/u/m/blob/main/voice.zip">voice.zip</a>'
    get = make_get({
        "https://huggingface.co/u/m/tree/main": FakeResponse(
            content=page.encode(), headers={"Content-Type": "text/html"}
        ),
        "https://huggingface.co/u/m/resolve/main/voice.zip": FakeResponse(
            content=buf.getvalue(),
            headers={"Content-Type": "application/zip"},
        ),
    })
    from rvc_tpu.utils.downloads import model_download_pipeline

    dest = model_download_pipeline(
        "https://huggingface.co/u/m/tree/main", str(tmp_path), http_get=get
    )
    pths, idxs = search_pth_index(dest)
    assert [os.path.basename(p) for p in pths] == ["voice.pth"]
    assert [os.path.basename(p) for p in idxs] == ["voice.index"]


def test_scrape_zip_link_rewrites_blob():
    html = '<a href="/repo/blob/main/a.zip">a</a>'
    assert scrape_zip_link(html) == "https://huggingface.co/repo/resolve/main/a.zip"
    with pytest.raises(LinkResolveError):
        scrape_zip_link("<html>no zips</html>")


def test_filename_from_headers():
    assert filename_from_headers(
        {"Content-Disposition": "attachment; filename*=UTF-8''m%20x.pth"},
        "https://x/y",
    ) == "m x.pth"
    assert filename_from_headers(
        {"Content-Disposition": 'attachment; filename="a/b.zip"'}, "https://x"
    ) == "a_b.zip"
    assert filename_from_headers({}, "https://x/path/f.bin?q=1") == "f.bin"
    assert filename_from_headers({}, "https://x/") == "downloaded_file"


def test_status_error(tmp_path):
    get = make_get({})  # every URL 404s
    with pytest.raises(LinkResolveError, match="404"):
        download_link("https://example.com/x.pth", str(tmp_path), http_get=get)
