"""ValueMetadata XML parse/generate — driver-side config machinery.

Reference parity:
- parse: ksb/CMetadataXmlParser.java:39-193 + ValueMetadataParser.java:33-102
  (SAX parse of C_METADATAXML: datatype, enum values, units) — here a
  stdlib ElementTree parse of the same element shapes.
- generate: dest/metadata/PropositionConceptTreeBuilder.java:118-125,180-215
  (emit <ValueMetadata> blobs for leaf lab/modifier concepts).

These run on the driver against the (small) ontology metadata, exactly as
the reference parses config before the distributed load starts.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from xml.sax.saxutils import escape


@dataclass
class ValueMetadata:
    test_id: str
    datatype: str = "String"  # PosFloat / Float / PosInteger / Integer / String / Enum
    unit: str | None = None
    enum_values: list[str] = field(default_factory=list)
    oktousevalues: bool = True


def parse_value_metadata(xml: str) -> ValueMetadata:
    root = ET.fromstring(xml)
    if root.tag != "ValueMetadata":
        raise ValueError(f"expected <ValueMetadata>, got <{root.tag}>")
    get = lambda tag: (root.findtext(tag) or "").strip()
    enum_vals = [
        (v.text or "").strip() for v in root.findall("./EnumValues/Val")
    ]
    return ValueMetadata(
        test_id=get("TestID"),
        datatype=get("DataType") or "String",
        unit=(root.findtext("./UnitValues/NormalUnits") or "").strip() or None,
        enum_values=enum_vals,
        oktousevalues=get("Oktousevalues").upper() != "N",
    )


def generate_value_metadata(vm: ValueMetadata) -> str:
    """Emit the XML blob in the shape i2b2's UI expects (and the reference
    generates)."""
    parts = [
        "<ValueMetadata>",
        f"<Version>3.02</Version>",
        f"<CreationDateTime/>",
        f"<TestID>{escape(vm.test_id)}</TestID>",
        f"<TestName>{escape(vm.test_id)}</TestName>",
        f"<DataType>{escape(vm.datatype)}</DataType>",
        f"<Oktousevalues>{'Y' if vm.oktousevalues else 'N'}</Oktousevalues>",
    ]
    if vm.enum_values:
        parts.append("<EnumValues>")
        parts.extend(f"<Val description=\"\">{escape(v)}</Val>" for v in vm.enum_values)
        parts.append("</EnumValues>")
    if vm.unit:
        parts.append(
            f"<UnitValues><NormalUnits>{escape(vm.unit)}</NormalUnits></UnitValues>"
        )
    parts.append("</ValueMetadata>")
    return "".join(parts)
