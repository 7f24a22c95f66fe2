import io
import zipfile

import numpy as np
import pytest

from eitx.core.errors import IngestError
from eitx.io import (
    decode_image,
    encode_png_base64,
    extract_first_image,
    extract_nifti_middle_slice,
    largest_series_from_zip,
    read_dicom,
    read_nifti,
    to_png_bytes,
    write_dicom,
    write_nifti,
)


def _phantom(seed=0, shape=(64, 64)):
    rng = np.random.default_rng(seed)
    return rng.integers(-50, 3000, shape).astype(np.int16)


def test_dicom_roundtrip():
    px = _phantom()
    blob = write_dicom(px, series_uid="1.2.3.4", instance_number=7,
                       patient_position="FFS", pixel_spacing=(0.7, 0.8),
                       rescale_intercept=-1024, rescale_slope=1)
    ds = read_dicom(blob)
    assert ds.series_instance_uid == "1.2.3.4"
    assert ds.instance_number == 7
    assert ds.patient_position == "FFS"
    assert ds.pixel_spacing == [0.7, 0.8]
    assert ds.rescale_intercept == -1024
    assert ds.rescale_slope == 1
    assert ds.rows == 64 and ds.cols == 64
    assert np.array_equal(ds.pixel_array, px)
    assert ds.image_orientation == [1, 0, 0, 0, 1, 0]
    assert ds.patient_orientation == ["L", "P"]


def test_dicom_rejects_garbage():
    with pytest.raises(IngestError):
        read_dicom(b"not a dicom file at all" * 10)


def test_nifti_roundtrip():
    vol = _phantom(shape=(32, 32)).reshape(32, 32, 1).repeat(5, axis=2)
    blob = write_nifti(vol, pixdim=(1.0, 0.7, 0.9, 2.5), gzipped=True)
    back, pixdim = read_nifti(blob)
    assert back.shape == (32, 32, 5)
    assert np.array_equal(back.astype(np.int16), vol)
    assert abs(pixdim[1] - 0.7) < 1e-6 and abs(pixdim[2] - 0.9) < 1e-6
    # non-gz too
    blob2 = write_nifti(vol, gzipped=False)
    back2, _ = read_nifti(blob2)
    assert np.array_equal(back2.astype(np.int16), vol)


def test_nifti_rejects_garbage():
    with pytest.raises(IngestError):
        read_nifti(b"\x00" * 400)


def _zip_of(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries:
            zf.writestr(name, data)
    buf.seek(0)
    return buf


def test_largest_series_selection():
    entries = []
    for i in range(5):
        entries.append(
            (f"big/{i}.dcm", write_dicom(_phantom(i), "1.1.1", i + 1))
        )
    for i in range(2):
        entries.append(
            (f"small/{i}.dcm", write_dicom(_phantom(10 + i), "2.2.2", i + 1))
        )
    entries.append(("notes.txt", b"ignore me"))
    slices, custom = largest_series_from_zip(_zip_of(entries))
    assert len(slices) == 5
    assert all(s.series_instance_uid == "1.1.1" for s in slices)
    assert custom == 0


def test_custom_input_offset():
    entries = [("a.dcm", write_dicom(_phantom(), "1.1.1", 1)),
               ("custom_input.txt", b"17")]
    slices, custom = largest_series_from_zip(_zip_of(entries))
    assert custom == 17


def test_empty_zip_raises():
    with pytest.raises(IngestError):
        largest_series_from_zip(_zip_of([("readme.txt", b"x")]))


def test_extract_nifti_middle_slice():
    vol = np.zeros((16, 20, 9), dtype=np.int16)
    vol[:, :, 4] = 99
    blob = write_nifti(vol, pixdim=(1.0, 0.5, 0.6, 1.0))
    slices = _zip_of([("scan.nii.gz", blob)])
    sl, spacing = extract_nifti_middle_slice(slices)
    assert (sl == 99).all()
    # rotate 90 CW: (16, 20) -> (20, 16)
    assert sl.shape == (20, 16)
    assert np.allclose(spacing, [0.5, 0.6], atol=1e-6)  # f32 header fields


def test_extract_first_image_and_png_roundtrip():
    img = (np.random.default_rng(0).uniform(0, 255, (32, 32, 3))).astype(np.uint8)
    png = to_png_bytes(img)
    back = decode_image(png)
    assert np.array_equal(back, img)
    z = _zip_of([("slice.png", png)])
    out = extract_first_image(z)
    assert np.array_equal(out, img)
    b64 = encode_png_base64(img)
    assert isinstance(b64, str) and len(b64) > 100


def test_decode_image_garbage():
    with pytest.raises(IngestError):
        decode_image(b"nope")
