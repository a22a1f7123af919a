"""Real XLSX source — the reference's workbook connector, dependency-free.

The reference parses 3-sheet .xlsx workbooks with xlrd/openpyxl
(utilities.py:15-64, consumed by convert_xlsx_to_mods.py:24-60). No
spreadsheet library ships in this environment — but .xlsx IS a zip of
XML parts (ECMA-376: ``xl/worksheets/sheetN.xml`` cell grid +
``xl/sharedStrings.xml`` string table), so this module parses it with
stdlib ``zipfile`` + ``xml.etree`` only.

Distribution model (the Spark-first part): workbooks are read through the
``binaryFile`` source and parsed EXECUTOR-SIDE in an Arrow-batched
``mapInPandas`` — a directory of 10^5 workbooks parses as a normal
distributed scan, nothing funnels through the driver. Only schema
discovery (header row of ONE workbook) runs driver-side, exactly like
Spark's own CSV/JSON inference but bounded to a single file.

Cell semantics covered: shared strings (``t="s"``), inline strings
(``t="inlineStr"``), formula/plain numbers (``<v>``), boolean (``t="b"``),
sparse rows (A1-reference gaps → None). All values surface as strings —
the reference's sheets are string-typed too; callers cast at read like
the CSV connector does.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 … (the base-26 column part of an A1 ref)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _local(tag: str) -> str:
    """Strip the XML namespace — sheet parts use the spreadsheetml default
    namespace; matching on local names keeps the parser schema-agnostic."""
    return tag.rsplit("}", 1)[-1]


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ElementTree.fromstring(data):
        # a shared string is one <t> or a sequence of rich-text runs <r>;
        # phonetic-guide runs <rPh> (furigana from Japanese Excel) also
        # carry <t> descendants but are NOT part of the cell value —
        # openpyxl/xlrd skip them too.
        parts = []
        for child in si:
            loc = _local(child.tag)
            if loc == "t":
                parts.append(child.text or "")
            elif loc == "r":
                parts.extend(
                    t.text or "" for t in child.iter() if _local(t.tag) == "t"
                )
        out.append("".join(parts))
    return out


_RID_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


def _sheet_parts(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """(sheet name, worksheet part path) in workbook order, resolving each
    sheet's ``r:id`` through ``xl/_rels/workbook.xml.rels`` as OPC
    requires — a workbook saved after deleting/reordering sheets keeps
    NON-sequential part names (first sheet stored as sheet2.xml), so the
    positional ``sheet{i+1}.xml`` guess reads the wrong sheet or KeyErrors.
    Falls back to positional naming only when rels/r:id are absent."""
    root = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    sheets = [
        (el.get("name"), el.get(_RID_ATTR))
        for el in root.iter()
        if _local(el.tag) == "sheet"
    ]
    rels: dict[str, str] = {}
    try:
        rroot = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rels = {
            el.get("Id"): el.get("Target")
            for el in rroot.iter()
            if _local(el.tag) == "Relationship"
        }
    except KeyError:
        pass
    out = []
    for i, (name, rid) in enumerate(sheets):
        target = rels.get(rid)
        if target is None:
            part = f"xl/worksheets/sheet{i + 1}.xml"
        else:
            target = target.lstrip("/")
            part = target if target.startswith("xl/") else f"xl/{target}"
        out.append((name, part))
    return out


def _sheet_names(zf: zipfile.ZipFile) -> list[str]:
    return [n for n, _ in _sheet_parts(zf)]


def parse_xlsx(content: bytes, sheet: int | str = 0) -> list[list]:
    """One workbook's sheet → list of rows (lists of str|None), sparse
    cells None-filled, trailing ragged rows padded by the caller."""
    zf = zipfile.ZipFile(io.BytesIO(content))
    parts = _sheet_parts(zf)
    names = [n for n, _ in parts]
    if isinstance(sheet, str):
        if sheet not in names:
            raise ValueError(f"workbook has sheets {names}, requested {sheet!r}")
        idx = names.index(sheet)
    else:
        idx = int(sheet)
        if not 0 <= idx < len(names):
            raise ValueError(f"workbook has sheets {names}, requested {sheet!r}")
    strings = _shared_strings(zf)
    root = ElementTree.fromstring(zf.read(parts[idx][1]))
    rows: list[list] = []
    for row_el in (el for el in root.iter() if _local(el.tag) == "row"):
        cells: list = []
        for c in row_el:
            if _local(c.tag) != "c":
                continue
            ref = c.get("r")
            ci = _col_index(_CELL_REF.match(ref).group(1)) if ref else len(cells)
            while len(cells) < ci:
                cells.append(None)
            ctype = c.get("t", "n")
            value = None
            for child in c:
                lc = _local(child.tag)
                if lc == "v":
                    value = child.text
                elif lc == "is":  # inline string
                    value = "".join(
                        t.text or "" for t in child.iter() if _local(t.tag) == "t"
                    )
            if ctype == "s" and value is not None:
                value = strings[int(value)]
            elif ctype == "b" and value is not None:
                value = "true" if value == "1" else "false"
            cells.append(value)
        rows.append(cells)
    return rows


def read_xlsx(
    spark: SparkSession,
    path: str,
    *,
    sheet: int | str = 0,
    header: bool = True,
    columns: list[str] | None = None,
) -> DataFrame:
    """Distributed workbook scan: ``binaryFile`` source → executor-side
    ``mapInPandas`` parse. Pass ``columns`` to skip the driver-side
    schema-discovery read (recommended for huge directories)."""
    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xlsx")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    if columns is None:
        first = src.select("content").limit(1).collect()
        if not first:
            raise FileNotFoundError(f"no .xlsx files under {path}")
        head_rows = parse_xlsx(bytes(first[0]["content"]), sheet)
        if not head_rows:
            raise ValueError("cannot infer columns from an empty sheet")
        width = max(len(r) for r in head_rows)
        if header:
            # size the schema to the WIDEST row, not the header: ragged
            # sheets with trailing unnamed columns would otherwise lose
            # those columns from every row. Unnamed/None header cells get
            # positional names; duplicates get a numeric suffix (a
            # duplicate-column schema fails downstream).
            head = list(head_rows[0]) + [None] * (width - len(head_rows[0]))
            literal = {str(c) for c in head if c is not None}
            seen: set[str] = set()
            columns = []
            for i, c in enumerate(head):
                name = f"_c{i}" if c is None else str(c)
                if name in seen:
                    # probe until the suffix collides with NEITHER an
                    # emitted name NOR a literal later header cell — a
                    # header like [a, a, a_2] must not emit a_2 twice
                    k = 2
                    while f"{name}_{k}" in seen or f"{name}_{k}" in literal:
                        k += 1
                    name = f"{name}_{k}"
                seen.add(name)
                columns.append(name)
        else:
            columns = [f"_c{i}" for i in range(width)]
    cols = list(columns)

    def extract(batches):
        for pdf in batches:
            frames = []
            for content in pdf["content"]:
                rows = parse_xlsx(bytes(content), sheet)
                if header and rows:
                    rows = rows[1:]
                frames.append(
                    pd.DataFrame(
                        [(r + [None] * len(cols))[: len(cols)] for r in rows],
                        columns=cols,
                        dtype=object,
                    )
                )
            yield (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame(columns=cols, dtype=object)
            )

    ddl = ", ".join(f"`{c}` string" for c in cols)
    return src.mapInPandas(extract, schema=ddl)


# ----------------------------------------------------------------- writer
# Minimal ECMA-376 writer (inline strings only) — a driver-side fixture /
# export helper so round-trip tests need no external tool. NOT a data-plane
# sink; the partitioned/zip export sinks (sinks.py) are the scale path.
_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    "{sheet_overrides}</Types>"
)
_SHEET_OVERRIDE = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" '
    'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WB = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    "<sheets>{sheets}</sheets></workbook>"
)
_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    "{rels}</Relationships>"
)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _col_letters(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(65 + r) + out
    return out


def write_xlsx(
    sheets: dict[str, pd.DataFrame], path: str, *, header: bool = True
) -> None:
    """Write a (multi-sheet) workbook — header row + inline-string cells;
    None/NaN cells are omitted (read back as None). ``header=False``
    omits the column-name row (the data rows start at row 1)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        n = len(sheets)
        zf.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(
                sheet_overrides="".join(
                    _SHEET_OVERRIDE.format(i=i + 1) for i in range(n)
                )
            ),
        )
        zf.writestr("_rels/.rels", _RELS)
        zf.writestr(
            "xl/workbook.xml",
            _WB.format(
                sheets="".join(
                    f'<sheet name="{_xml_escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                    for i, name in enumerate(sheets)
                )
            ),
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            _WB_RELS.format(
                rels="".join(
                    f'<Relationship Id="rId{i + 1}" '
                    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
                    f'Target="worksheets/sheet{i + 1}.xml"/>'
                    for i in range(n)
                )
            ),
        )
        for i, (name, pdf) in enumerate(sheets.items()):
            body = []
            grid = ([list(pdf.columns)] if header else []) + pdf.astype(
                object
            ).values.tolist()
            for ri, row in enumerate(grid):
                cells = []
                for ci, v in enumerate(row):
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        continue
                    ref = f"{_col_letters(ci)}{ri + 1}"
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                        f"{_xml_escape(str(v))}</t></is></c>"
                    )
                body.append(f'<row r="{ri + 1}">' + "".join(cells) + "</row>")
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                "<sheetData>" + "".join(body) + "</sheetData></worksheet>",
            )
