"""Minimal VTK XML UnstructuredGrid (.vtu) reader.

The reference delegates mesh ingestion to ``meshio``
(convert_to_binary.py:185); meshio is not available in this environment, so
this is a self-contained reader covering the formats the VTK XML spec allows
and that the bundled fixtures use:

* ``format="ascii"`` (also when the attribute is omitted — VTK's default)
* ``format="appended"`` with ``encoding="raw"`` or ``encoding="base64"``
* ``format="binary"`` (inline base64)
* ``header_type`` UInt32 (default) or UInt64
* optional ``compressor="vtkZLibDataCompressor"``

Only what the pipeline needs is extracted: points, cell connectivity
(homogeneous blocks by VTK type), point data, and cell data.
"""

from __future__ import annotations

import base64
import re
import zlib
from dataclasses import dataclass, field
from xml.etree import ElementTree

import numpy as np

_VTK_TO_NP = {
    "Int8": np.int8,
    "UInt8": np.uint8,
    "Int16": np.int16,
    "UInt16": np.uint16,
    "Int32": np.int32,
    "UInt32": np.uint32,
    "Int64": np.int64,
    "UInt64": np.uint64,
    "Float32": np.float32,
    "Float64": np.float64,
}

# VTK cell type id -> (name, n_points). Only linear 2D/3D simplex-ish types
# the framework supports, plus a few recognized-but-unsupported ones so we
# can give good error messages.
VTK_CELL_TYPES = {
    3: ("line", 2),
    5: ("triangle", 3),
    9: ("quad", 4),
    10: ("tetra", 4),
    12: ("hexahedron", 8),
    13: ("wedge", 6),
    14: ("pyramid", 5),
}

CELL_TYPE_TO_VTK = {name: tid for tid, (name, _) in VTK_CELL_TYPES.items()}


@dataclass
class CellBlock:
    type: str  # "triangle" | "quad" | "tetra" | ...
    data: np.ndarray  # (n_cells, n_points_per_cell) int64, 0-based


@dataclass
class Mesh:
    """In-memory unstructured mesh, mirroring the slice of meshio's Mesh
    that the converter uses (convert_to_binary.py:185-224)."""

    points: np.ndarray  # (n_points, 3) float64
    cells: list  # list[CellBlock]
    point_data: dict = field(default_factory=dict)  # name -> (n_points,) array
    cell_data: dict = field(default_factory=dict)  # name -> (n_cells,) array


def _split_appended_blob(raw: bytes):
    """Split the file into parseable XML text and the appended raw blob.

    A raw-encoded <AppendedData> section is not valid XML, so locate it
    byte-wise, cut the blob out, and hand ElementTree a sanitized document.
    """
    m = re.search(rb"<AppendedData[^>]*>", raw)
    if m is None:
        return raw, None
    enc_m = re.search(rb'encoding="([^"]+)"', m.group(0))
    encoding = enc_m.group(1).decode() if enc_m else "base64"
    start = m.end()
    end = raw.rfind(b"</AppendedData>")
    if end < 0:
        raise ValueError("Unterminated <AppendedData> section")
    blob = raw[start:end]
    # Data begins after the first '_' marker
    underscore = blob.find(b"_")
    if underscore < 0:
        raise ValueError("<AppendedData> has no '_' marker")
    blob = blob[underscore + 1 :]
    if encoding == "base64":
        blob = base64.b64decode(blob + b"===")
    xml_text = raw[: m.end()] + raw[end:]
    return xml_text, blob


def _decode_block(buf: bytes, header_dtype, compressed: bool) -> bytes:
    """Decode one header-prefixed data block (possibly zlib compressed)."""
    hsize = np.dtype(header_dtype).itemsize
    if not compressed:
        (nbytes,) = np.frombuffer(buf[:hsize], dtype=header_dtype)
        return buf[hsize : hsize + int(nbytes)]
    # Compressed layout: [n_blocks, uncompressed_block_size, last_block_size,
    #                     compressed_size_0..n-1] then the compressed blocks.
    (n_blocks,) = np.frombuffer(buf[:hsize], dtype=header_dtype)
    n_blocks = int(n_blocks)
    header = np.frombuffer(buf[: hsize * (3 + n_blocks)], dtype=header_dtype)
    comp_sizes = header[3 : 3 + n_blocks].astype(np.int64)
    pos = hsize * (3 + n_blocks)
    out = bytearray()
    for cs in comp_sizes:
        out.extend(zlib.decompress(buf[pos : pos + int(cs)]))
        pos += int(cs)
    return bytes(out)


def _read_data_array(elem, blob, header_dtype, compressed) -> np.ndarray:
    dtype = _VTK_TO_NP[elem.attrib["type"]]
    fmt = elem.attrib.get("format", "ascii")
    if fmt == "ascii":
        text = elem.text or ""
        if np.issubdtype(dtype, np.floating):
            arr = np.array(text.split(), dtype=np.float64).astype(dtype)
        else:
            arr = np.array(text.split(), dtype=np.int64).astype(dtype)
        return arr
    if fmt == "appended":
        if blob is None:
            raise ValueError("appended DataArray but no <AppendedData> blob")
        offset = int(elem.attrib.get("offset", "0"))
        payload = _decode_block(blob[offset:], header_dtype, compressed)
        return np.frombuffer(payload, dtype=np.dtype(dtype).newbyteorder("<"))
    if fmt == "binary":
        text = "".join((elem.text or "").split())
        raw = base64.b64decode(text + "===")
        payload = _decode_block(raw, header_dtype, compressed)
        return np.frombuffer(payload, dtype=np.dtype(dtype).newbyteorder("<"))
    raise ValueError(f"Unsupported DataArray format {fmt!r}")


def read_vtu(filename) -> Mesh:
    with open(filename, "rb") as f:
        raw = f.read()

    xml_text, blob = _split_appended_blob(raw)
    root = ElementTree.fromstring(xml_text)
    if root.tag != "VTKFile" or root.attrib.get("type") != "UnstructuredGrid":
        raise ValueError(f"{filename} is not a VTK XML UnstructuredGrid file")
    byte_order = root.attrib.get("byte_order", "LittleEndian")
    if byte_order != "LittleEndian":
        raise ValueError("Only LittleEndian .vtu files are supported")
    header_dtype = _VTK_TO_NP[root.attrib.get("header_type", "UInt32")]
    compressor = root.attrib.get("compressor")
    compressed = compressor == "vtkZLibDataCompressor"
    if compressor not in (None, "", "vtkZLibDataCompressor"):
        raise ValueError(f"Unsupported compressor {compressor!r}")

    grid = root.find("UnstructuredGrid")
    piece = grid.find("Piece")
    n_points = int(piece.attrib["NumberOfPoints"])
    n_cells = int(piece.attrib["NumberOfCells"])

    def rd(elem):
        return _read_data_array(elem, blob, header_dtype, compressed)

    # Points
    pts_elem = piece.find("Points").find("DataArray")
    n_comp = int(pts_elem.attrib.get("NumberOfComponents", "3"))
    points = rd(pts_elem).astype(np.float64).reshape(n_points, n_comp)
    if n_comp < 3:  # always store 3D coordinates (m_interp_unstructured.f90:37)
        points = np.pad(points, ((0, 0), (0, 3 - n_comp)))

    # Cells
    cells_elem = piece.find("Cells")
    arrays = {}
    for da in cells_elem.findall("DataArray"):
        arrays[da.attrib["Name"]] = rd(da)
    connectivity = arrays["connectivity"].astype(np.int64)
    offsets = arrays["offsets"].astype(np.int64)
    types = arrays["types"].astype(np.int64)
    if len(offsets) != n_cells or len(types) != n_cells:
        raise ValueError("Inconsistent cell arrays")

    # Group consecutive runs of the same cell type into homogeneous blocks
    cells = []
    begin = 0
    i = 0
    while i < n_cells:
        t = types[i]
        j = i
        while j < n_cells and types[j] == t:
            j += 1
        if int(t) not in VTK_CELL_TYPES:
            raise ValueError(f"Unsupported VTK cell type id {int(t)}")
        name, npc = VTK_CELL_TYPES[int(t)]
        conn_end = offsets[j - 1]
        block = connectivity[begin:conn_end].reshape(j - i, npc)
        cells.append(CellBlock(name, block))
        begin = conn_end
        i = j

    mesh = Mesh(points=points, cells=cells)

    pd = piece.find("PointData")
    if pd is not None:
        for da in pd.findall("DataArray"):
            name = da.attrib.get("Name", f"point_array_{len(mesh.point_data)}")
            arr = rd(da)
            ncomp = int(da.attrib.get("NumberOfComponents", "1"))
            if ncomp > 1:
                arr = arr.reshape(n_points, ncomp)
            mesh.point_data[name] = arr

    cd = piece.find("CellData")
    if cd is not None:
        for da in cd.findall("DataArray"):
            name = da.attrib.get("Name", f"cell_array_{len(mesh.cell_data)}")
            arr = rd(da)
            ncomp = int(da.attrib.get("NumberOfComponents", "1"))
            if ncomp > 1:
                arr = arr.reshape(n_cells, ncomp)
            mesh.cell_data[name] = arr

    return mesh
