#!/usr/bin/env python3
"""Build fixtures/xlsx/missing_shared_strings.xlsx: a structurally valid
workbook whose sheet references shared strings (t="s") while the zip has
NO xl/sharedStrings.xml part — the corrupt-export shape some spreadsheet
tools produce when the string table write is interrupted. The engine's
coerce convention (reference pd.read_excel tolerance / on_bad_lines
family): unresolvable string refs read back as NULL, numeric cells are
unaffected. Deterministic output (fixed zip mtimes, stored entries).
"""
import os
import zipfile

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "fixtures", "xlsx", "missing_shared_strings.xlsx")

CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>"""

RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""

WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""

WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""

# Header row is inline strings (survives the missing table); data rows
# mix shared-string refs (t="s" -> must coerce to NULL) with numbers.
SHEET = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>sku</t></is></c><c r="B1" t="inlineStr"><is><t>name</t></is></c><c r="C1" t="inlineStr"><is><t>qty</t></is></c></row>
<row r="2"><c r="A2"><v>101</v></c><c r="B2" t="s"><v>0</v></c><c r="C2"><v>5</v></c></row>
<row r="3"><c r="A3"><v>102</v></c><c r="B3" t="s"><v>1</v></c><c r="C3"><v>7</v></c></row>
<row r="4"><c r="A4"><v>103</v></c><c r="B4" t="inlineStr"><is><t>inline ok</t></is></c><c r="C4"><v>9</v></c></row>
</sheetData></worksheet>"""


def main():
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in [
            ("[Content_Types].xml", CT),
            ("_rels/.rels", RELS),
            ("xl/workbook.xml", WB),
            ("xl/_rels/workbook.xml.rels", WB_RELS),
            ("xl/worksheets/sheet1.xml", SHEET),
        ]:
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            z.writestr(zi, data)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
