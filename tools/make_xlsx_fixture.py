#!/usr/bin/env python3
"""Generate the committed XLSX ingestion fixtures (stdlib only, deterministic).

Authors synthetic workbooks mirroring the *shapes* of the reference's Excel
inputs (reference etl_sales.py:36-43 reads Russian-header order exports that
store every cell as inlineStr; etl_purchases.py:28-29 reads a supplier
workbook that uses sharedStrings, date-styled numeric serials and
formula-cached values). Content is own-authored; no bytes are taken from the
reference files.

Each fixture gets a semicolon-CSV twin holding the values the graft Xlsx
reader contract emits (dates as ISO strings, booleans as true/false, error
cells empty). The DuckDB oracle reads the twin; Spark reads the .xlsx — the
twin is written from the SAME in-memory row data, so reader and oracle cannot
drift.

Zip entries carry a fixed timestamp so regeneration is byte-stable.
"""
import csv
import io
import zipfile
from datetime import date, timedelta
from pathlib import Path

OUT = Path(__file__).resolve().parents[1] / "fixtures" / "xlsx"
EPOCH = date(1899, 12, 30)  # Excel serial epoch (post-1900-bug region)
ZTIME = (2026, 1, 1, 0, 0, 0)


def serial(d: str) -> int:
    y, m, dd = map(int, d.split("-"))
    return (date(y, m, dd) - EPOCH).days


def esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
             .replace('"', "&quot;"))


def col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


# A cell is (kind, payload):
#   ("inline", text) | ("sst", text) | ("num", text) | ("date", iso) |
#   ("date_custom", iso) | ("fdate", iso) | ("fnum", text) | ("fstr", text) |
#   ("bool", "1"/"0") | ("err", code) | ("empty_t",) | None (absent cell)
def cell_xml(ref: str, cell, sst_idx):
    if cell is None:
        return ""
    kind = cell[0]
    if kind == "inline":
        return f'<c r="{ref}" t="inlineStr"><is><t>{esc(cell[1])}</t></is></c>'
    if kind == "empty_t":
        return f'<c r="{ref}" t="inlineStr"><is><t></t></is></c>'
    if kind == "sst":
        return f'<c r="{ref}" t="s"><v>{sst_idx[cell[1]]}</v></c>'
    if kind == "num":
        return f'<c r="{ref}"><v>{cell[1]}</v></c>'
    if kind == "date":          # style 1 -> builtin numFmt 14
        return f'<c r="{ref}" s="1"><v>{serial(cell[1])}</v></c>'
    if kind == "date_custom":   # style 2 -> custom numFmt dd.mm.yyyy
        return f'<c r="{ref}" s="2"><v>{serial(cell[1])}</v></c>'
    if kind == "fdate":         # formula with date-styled cached serial
        return (f'<c r="{ref}" s="1"><f>B1+14</f>'
                f'<v>{serial(cell[1])}</v></c>')
    if kind == "fnum":          # formula with cached number, General style
        return f'<c r="{ref}"><f>D2*2</f><v>{cell[1]}</v></c>'
    if kind == "fstr":          # formula with cached string
        return f'<c r="{ref}" t="str"><f>CONCAT(A1,B1)</f><v>{esc(cell[1])}</v></c>'
    if kind == "bool":
        return f'<c r="{ref}" t="b"><v>{cell[1]}</v></c>'
    if kind == "err":
        return f'<c r="{ref}" t="e"><v>{cell[1]}</v></c>'
    raise ValueError(kind)


def sheet_xml(rows, sst_idx):
    body = []
    for ri, row in enumerate(rows, start=1):
        cells = "".join(
            cell_xml(f"{col_letter(ci)}{ri}", c, sst_idx)
            for ci, c in enumerate(row))
        body.append(f'<row r="{ri}">{cells}</row>')
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(body) + "</sheetData></worksheet>")


STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<numFmts count="1"><numFmt numFmtId="164" formatCode="dd.mm.yyyy"/></numFmts>
<cellXfs count="3">
<xf numFmtId="0" applyNumberFormat="0"/>
<xf numFmtId="14" applyNumberFormat="1"/>
<xf numFmtId="164" applyNumberFormat="1"/>
</cellXfs></styleSheet>"""

CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
</Types>"""

ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def workbook_xml(sheets):
    entries = "".join(
        f'<sheet name="{esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(sheets))
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships">'
            f'<sheets>{entries}</sheets></workbook>')


def wb_rels(nsheets):
    # Deliberately list the styles rel FIRST and use non-sequential ids so the
    # reader must resolve sheet targets through r:id, not assume sheet1.xml.
    rels = ['<Relationship Id="rIdS" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/styles" Target="styles.xml"/>']
    for i in range(nsheets):
        rels.append(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheetX{i + 1}.xml"/>')
    rels.append('<Relationship Id="rIdT" Type="http://schemas.openxmlformats'
                '.org/officeDocument/2006/relationships/sharedStrings" '
                'Target="sharedStrings.xml"/>')
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships">' + "".join(rels) + "</Relationships>")


def sst_xml(strings):
    items = "".join(f"<si><t>{esc(s)}</t></si>" for s in strings)
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
            f'2006/main" count="{len(strings)}" uniqueCount="{len(strings)}">'
            + items + "</sst>")


def collect_sst(sheets):
    strings, idx = [], {}
    for rows in sheets:
        for row in rows:
            for c in row:
                if c is not None and c[0] == "sst" and c[1] not in idx:
                    idx[c[1]] = len(strings)
                    strings.append(c[1])
    return strings, idx


def write_xlsx(path: Path, sheets):  # sheets: list of (name, rows)
    strings, idx = collect_sst([r for _, r in sheets])
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        def put(name, data):
            zi = zipfile.ZipInfo(name, date_time=ZTIME)
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, data)
        put("[Content_Types].xml", CONTENT_TYPES)
        put("_rels/.rels", ROOT_RELS)
        put("xl/workbook.xml", workbook_xml([n for n, _ in sheets]))
        put("xl/_rels/workbook.xml.rels", wb_rels(len(sheets)))
        put("xl/styles.xml", STYLES)
        put("xl/sharedStrings.xml", sst_xml(strings))
        for i, (_, rows) in enumerate(sheets):
            put(f"xl/worksheets/sheetX{i + 1}.xml", sheet_xml(rows, idx))
    path.write_bytes(buf.getvalue())


# Twin value: what the graft Xlsx reader contract emits for the cell.
def twin_value(cell):
    if cell is None or cell[0] == "err":
        return ""
    kind = cell[0]
    if kind in ("inline", "sst", "num", "fnum", "fstr"):
        return cell[1]
    if kind == "empty_t":
        return ""
    if kind in ("date", "date_custom", "fdate"):
        return cell[1]
    if kind == "bool":
        return "true" if cell[1] == "1" else "false"
    raise ValueError(kind)


def write_twin(path: Path, header, file_rows):  # file_rows: [(fname, rows)]
    with path.open("w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(header + ["_file", "_row"])
        for fname, rows in file_rows:
            for ri, row in enumerate(rows[1:], start=2):
                padded = list(row) + [None] * (len(header) - len(row))
                w.writerow([twin_value(c) for c in padded] + [fname, ri])


def inl(s):
    return ("inline", s)


ORDER_HDR = ["№ заказа", "Дата поступления заказа",
             "Название товара в Kaspi Магазине", "Артикул", "Сумма",
             "Дата изменения статуса", "Статус", "Количество"]

ACTIVE_ROWS = [
    [inl(h) for h in ORDER_HDR],
    [inl("700100200"), inl("29.07.2025"), inl("Термобелье комплект чёрный L"),
     inl("210450331_SK1"), inl("11990"), inl("30.07.2025"),
     inl("Ожидает передачи курьеру"), inl("1")],
    # sparse row: cancellation reason absent, qty missing entirely (short row)
    [inl("700100201"), inl("29.07.2025"), inl("Футболка белая M"),
     inl("210450332_SK2"), inl("4490"), ("empty_t",), inl("Отменён")],
    # empty-string cells vs absent cells
    [inl("700100202"), inl("30.07.2025"), inl("  Кепка красная  "),
     inl("210450333_SK3"), inl("2990"), inl("31.07.2025"),
     inl("Выдан"), ("empty_t",)],
    [inl("700100203"), inl("31.07.2025"), inl("Носки 3 пары"),
     None, inl("1490"), inl("31.07.2025"), inl("Выдан"), inl("3")],
]

ARCHIVE_ROWS = [
    [inl(h) for h in ORDER_HDR],
    [inl("700099001"), inl("01.07.2025"), inl("Худи серое XL"),
     inl("210450334_SK4"), inl("8990"), inl("05.07.2025"),
     inl("Выдан"), inl("1")],
    # middle cell absent (Артикул skipped), comma-decimal price
    [inl("700099002"), inl("02.07.2025"), inl("Шарф зимний"),
     None, inl("3590,5"), inl("06.07.2025"), inl("Выдан"), inl("2")],
    # junk order id -> dropped by validation on both sides
    [inl("итого"), inl(""), inl(""), None, inl("31060"), None, inl(""), None],
]

PURCH_HDR = ["PO_Id", "SKU_KEY", "PO_Date", "Ast_arrival_date", "Qty",
             "Unit_COGS_KZT", "Total_Model_DeliveryCost_KZT",
             "Total_Model_FreightCost_KZT", "Paid", "Note"]

PURCHASE_ROWS = [
    [("sst", h) for h in PURCH_HDR],
    [("sst", "PO-001"), ("sst", "TSHIRT-BLK-L"), ("date", "2025-07-14"),
     ("fdate", "2025-07-31"), ("num", "120"), ("num", "1234.5"),
     ("num", "15000"), ("num", "163140"), ("bool", "1"),
     ("sst", "первая партия")],
    [("sst", "PO-001"), ("sst", "HOODIE-GRY-M"), ("date_custom", "2025-07-14"),
     ("fdate", "2025-07-31"), ("num", "60"), ("num", "2500"),
     ("num", "8000"), ("fnum", "158000"), ("bool", "0"), inl("повтор")],
    # duplicate (po_id, sku_key): first occurrence above must win
    [("sst", "PO-001"), ("sst", "TSHIRT-BLK-L"), ("date", "2025-07-20"),
     ("fdate", "2025-08-05"), ("num", "999"), ("num", "1111"),
     ("num", "1"), ("num", "1"), ("bool", "0"), ("sst", "дубликат")],
    # arrival missing, note is an error cell
    [("sst", "PO-002"), ("sst", "SOCKS-WHT"), ("date", "2025-08-01"),
     None, ("num", "400"), ("num", "150.25"), ("num", "3000"),
     ("num", "63100"), ("bool", "1"), ("err", "#N/A")],
    # qty absent (sparse), unit cost formula-cached, cached-string note
    [("sst", "PO-002"), ("sst", "CAP-RED"), ("date", "2025-08-01"),
     ("fdate", "2025-08-15"), None, ("fnum", "800"), ("num", "2000"),
     ("num", "2000"), ("bool", "0"), ("fstr", "авто-примечание")],
]

# Second sheet that a correct reader must ignore (pd.read_excel default
# reads only the first sheet).
DECOY_ROWS = [
    [("sst", "DO_NOT_READ")],
    [("sst", "decoy")],
]


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    write_xlsx(OUT / "ActiveOrders 31.7.25.xlsx",
               [("Orders", ACTIVE_ROWS)])
    write_xlsx(OUT / "ArchiveOrders since 1.7.25.xlsx",
               [("Orders", ARCHIVE_ROWS)])
    write_xlsx(OUT / "Purchase inquiry made by me.xlsx",
               [("T03_PURCHASE_ORDERS", PURCHASE_ROWS),
                ("decoy", DECOY_ROWS)])
    write_twin(OUT / "orders_twin.csv", ORDER_HDR,
               [("ActiveOrders 31.7.25.xlsx", ACTIVE_ROWS),
                ("ArchiveOrders since 1.7.25.xlsx", ARCHIVE_ROWS)])
    write_twin(OUT / "purchase_twin.csv", PURCH_HDR,
               [("Purchase inquiry made by me.xlsx", PURCHASE_ROWS)])
    print("wrote fixtures to", OUT)


if __name__ == "__main__":
    main()
