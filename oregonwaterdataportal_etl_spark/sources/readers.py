"""Source readers — SURVEY.md 2.1 scans re-expressed Spark-first.

The reference's HTTP fetch layers (ESRI/AWQMS/FROST) are process
boundaries, not operators; what the engine must reproduce is the
*shape* of each scan: projection, predicate pushdown, flattening,
pagination-as-partitioning, schema validation. Each reader here takes
files/DataFrames instead of URLs — on a cluster the same code runs
over a DataSource V2 connector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalar import parse_pacific_to_utc, unit_from_header


def read_tsv_observations(
    spark: SparkSession,
    path: str,
    station_col: str = "station_nbr",
    date_col: str = "record_date",
    value_col: str = "value",
    drop_null_values: bool = True,
    tz_from_pacific: bool = False,
) -> DataFrame:
    """S2 — TSV time-series scan (reference: parse_oregon_tsv,
    userCode/wrd/lib.py:56-102): header-derived unit, 3-column
    projection, optional null-drop (P2), tz normalization (F2).

    Projection + filter are expressed declaratively so Catalyst pushes
    them into the csv scan (ReadSchema/PushedFilters)."""
    raw = spark.read.csv(path, sep="\t", header=True)
    cols = raw.columns
    if len(cols) < 3:
        raise ValueError(f"expected >=3 TSV columns, got {cols}")
    station, date, value = cols[0], cols[1], cols[2]
    unit = unit_from_header(F.lit(value))
    ts = (
        parse_pacific_to_utc(F.col(date))
        if tz_from_pacific
        else F.coalesce(
            F.try_to_timestamp(F.col(date), F.lit("MM-dd-yyyy HH:mm")),
            F.try_to_timestamp(F.col(date), F.lit("MM-dd-yyyy")),
        )
    )
    out = raw.select(
        F.col(station).alias(station_col),
        ts.alias(date_col),
        F.col(value).cast("double").alias(value_col),
        unit.alias("unit"),
    )
    if drop_null_values:
        out = out.filter(F.col(value_col).isNotNull())
    return out


def flatten_nested_results(
    df: DataFrame, nested_col: str, keep_cols: list[str]
) -> DataFrame:
    """S3 — JSON scan + flatten (reference: fetch_observations
    flattening item['ContinuousResults'], userCode/awqms/lib.py:86-124).
    explode() the nested array; Catalyst prunes unreferenced struct
    fields from the scan."""
    return df.select(*keep_cols, F.explode(F.col(nested_col)).alias("result")).select(
        *keep_cols, "result.*"
    )


def paginated_union(pages: list[DataFrame]) -> DataFrame:
    """S5/U3 — pagination-as-partitioning (reference: offset pages of
    1000, userCode/groundwater/wells.py:287-344). In Spark, pages are
    just input partitions; a fold of unionByName keeps lineage flat."""
    if not pages:
        raise ValueError("no pages")
    out = pages[0]
    for p in pages[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def validate_columns(df: DataFrame, expected: list[str]) -> DataFrame:
    """S7/U4 — sheet-schema validation by column-set difference
    (reference: userCode/xlsx/lib.py:22-31)."""
    missing = set(expected) - set(df.columns)
    if missing:
        raise ValueError(f"missing expected columns: {sorted(missing)}")
    return df


def _xlsx_col_index(ref: str) -> int:
    """'A1' -> 0, 'BC7' -> 54 (0-based column index of a cell ref)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


# spreadsheetml builtin number formats that render as dates/times —
# the set openpyxl/pandas treat as datetime (ECMA-376 §18.8.30)
_XLSX_DATE_BUILTINS = set(range(14, 23)) | set(range(45, 48))
_XLSX_EPOCH_DAYS = 25569  # 1970-01-01 in Excel's 1900 serial system


def _xlsx_fmt_is_date(code: str) -> bool:
    """A custom numFmt renders a date iff its code contains a date
    token (y/m/d/h/s) outside quoted literals, [..] sections and
    escaped characters — the openpyxl heuristic."""
    out = []
    i, n = 0, len(code)
    while i < n:
        ch = code[i]
        if ch == '"':
            j = code.find('"', i + 1)
            i = n if j < 0 else j + 1
        elif ch == "[":
            j = code.find("]", i + 1)
            i = n if j < 0 else j + 1
        elif ch == "\\":
            i += 2
        else:
            out.append(ch)
            i += 1
    return any(c in "ymdhs" for c in "".join(out).lower())


def _xlsx_date_styles(z, local) -> set[int]:
    """Style (cellXfs) indices whose number format is a date — parsed
    from xl/styles.xml so the native reader converts date serials to
    datetimes exactly like the pandas/openpyxl path (the two backends
    previously returned different schemas for one workbook)."""
    import xml.etree.ElementTree as ET

    if "xl/styles.xml" not in z.namelist():
        return set()
    styles = ET.fromstring(z.read("xl/styles.xml"))
    date_fmts = set(_XLSX_DATE_BUILTINS)
    for el in styles.iter():
        if local(el.tag) == "numFmt" and _xlsx_fmt_is_date(el.get("formatCode", "")):
            date_fmts.add(int(el.get("numFmtId")))
    out: set[int] = set()
    for parent in styles.iter():
        if local(parent.tag) != "cellXfs":
            continue
        for i, xf in enumerate(e for e in parent if local(e.tag) == "xf"):
            if int(xf.get("numFmtId", "0")) in date_fmts:
                out.add(i)
    return out


def _xlsx_serial_to_datetime(serial: float, date1904: bool = False):
    """Excel serial -> datetime, rounded to the nearest millisecond to
    shed float noise. 1900 system: 1899-12-30 base (the openpyxl
    convention that absorbs the 1900 leap-year bug for all
    post-Feb-1900 dates). 1904 system (Excel-for-Mac default, declared
    by workbookPr date1904): 1904-01-01 base — ignoring the flag would
    silently shift every date by 1462 days."""
    import datetime

    base = datetime.datetime(1904, 1, 1) if date1904 else datetime.datetime(1899, 12, 30)
    ms = round(serial * 86400_000)
    return base + datetime.timedelta(milliseconds=ms)


def _read_xlsx_native(path: str, sheets: list[str] | None = None) -> dict:
    """Minimal in-tree xlsx (zip + spreadsheetml XML) reader — stdlib
    only (zipfile + ElementTree). Covers the subset the reference's
    pd.read_excel usage needs (userCode/xlsx/lib.py:33-56): sheet
    enumeration, shared/inline strings, numbers, booleans, date-styled
    serials (converted to datetimes via xl/styles.xml, matching the
    pandas/openpyxl backend); first row = header. Returns
    {sheet_name: pandas.DataFrame}."""
    import xml.etree.ElementTree as ET
    import zipfile

    import pandas as pd

    def local(tag):
        return tag.rsplit("}", 1)[-1]

    with zipfile.ZipFile(path) as z:
        # sheet name -> relationship id -> worksheet part path
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        date1904 = any(
            local(el.tag) == "workbookPr"
            and el.get("date1904", "0").lower() in ("1", "true")
            for el in wb.iter()
        )
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {}
        for rel in rels:
            target = rel.get("Target").lstrip("/")
            if not target.startswith("xl/"):
                target = "xl/" + target
            rid_to_target[rel.get("Id")] = target
        sheet_parts = {}
        for el in wb.iter():
            if local(el.tag) == "sheet":
                rid = next(v for k, v in el.attrib.items() if local(k) == "id")
                sheet_parts[el.get("name")] = rid_to_target[rid]
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst:
                shared.append("".join(t.text or "" for t in si.iter() if local(t.tag) == "t"))
        date_styles = _xlsx_date_styles(z, local)

        out = {}
        for name, part in sheet_parts.items():
            if sheets is not None and name not in sheets:
                continue
            ws = ET.fromstring(z.read(part))
            rows: list[list] = []
            for row in (el for el in ws.iter() if local(el.tag) == "row"):
                cells: list = []
                for c in row:
                    if local(c.tag) != "c":
                        continue
                    idx = _xlsx_col_index(c.get("r", ""))
                    if idx < 0:
                        idx = len(cells)
                    t = c.get("t", "n")
                    v = None
                    for child in c:
                        if local(child.tag) == "v":
                            v = child.text
                        elif local(child.tag) == "is":
                            v = "".join(
                                x.text or "" for x in child.iter() if local(x.tag) == "t"
                            )
                    if v is None:
                        val = None
                    elif t == "s":
                        val = shared[int(v)]
                    elif t in ("str", "inlineStr", "d"):  # d: ISO-8601 text
                        val = v
                    elif t == "b":
                        val = v in ("1", "true")
                    elif t == "e":  # formula error cell (#DIV/0! etc.)
                        val = None
                    elif int(c.get("s", "-1")) in date_styles:
                        val = _xlsx_serial_to_datetime(float(v), date1904)
                    else:
                        val = float(v)
                    while len(cells) < idx:
                        cells.append(None)
                    cells.append(val)
                rows.append(cells)
            if not rows:
                out[name] = pd.DataFrame()
                continue
            header = [str(h) for h in rows[0]]
            width = len(header)
            body = [r[:width] + [None] * (width - len(r)) for r in rows[1:]]
            out[name] = pd.DataFrame(body, columns=header)
    return out


def read_xlsx(spark: SparkSession, path: str, sheets: list[str] | None = None):
    """S7 — XLSX multi-sheet scan -> DataFrame per sheet (reference:
    pd.read_excel(sheet_name=None), userCode/xlsx/lib.py:33-56).
    Uses pandas/openpyxl when installed; otherwise the in-tree native
    zip+XML reader (_read_xlsx_native) — no dependency required."""
    try:
        import pandas as pd

        frames = pd.read_excel(path, sheet_name=None)
        if sheets is not None:
            frames = {k: v for k, v in frames.items() if k in sheets}
    except ImportError:
        frames = _read_xlsx_native(path, sheets)
    # column-less sheets (fully blank) cannot become DataFrames — drop
    # them rather than failing the whole workbook on schema inference
    return {
        name: spark.createDataFrame(pdf)
        for name, pdf in frames.items()
        if len(pdf.columns)
    }


def read_binary_attachments(spark: SparkSession, path_glob: str) -> DataFrame:
    """S8 — binary attachment scan (reference: xlsx_files_raw,
    userCode/xlsx/dag.py:56-76): Spark's binaryFile source gives
    (path, modificationTime, length, content) with partition-parallel
    fetch."""
    return spark.read.format("binaryFile").load(path_glob)
