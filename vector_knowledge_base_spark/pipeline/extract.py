"""Multi-format text extraction over binary columns (SURVEY §2.1 S2-S11).

The reference extracts per-upload with a class-per-format factory
(/root/reference/backend/extractors/factory.py:22-70, extension map) over
23 allowed extensions (/root/reference/backend/config.py:54-59). Here the
same dispatch runs distributed: a ``binaryFile`` scan yields
(path, content) rows, and one ``mapInPandas`` stage extracts text +
typed metadata per row — the multimodal-column pattern (binary in,
structured out).

Format support, mirroring the reference's behaviors:
- txt/md: utf-8 decode, errors ignored (text_extractor.py:15-25)
- code (py/js/java/cpp/html/css/json/xml/yaml/yml): raw text +
  ``language`` metadata from the extension (code_extractor.py:15-29)
- cs: code + namespace sniff in the first 20 lines (cs_extractor.py:41-44)
- csv: encoding fallback utf-8 → latin-1 → cp1252, csv.Sniffer
  delimiter/header detection on the first 4 KB, rows rendered
  ``"a | b | c"`` joined by newlines (csv_extractor.py:36-79)
- pdf/docx/pptx/ppt/xlsx/jpg/jpeg/png/webp: binary formats whose
  decode libraries (pypdf, docx2txt, python-pptx, openpyxl, PIL,
  pytesseract) are NOT in this container — the decode step is STUBBED
  (raises NotImplementedError inside a try, recorded as an extraction
  error row). The Spark plumbing — schema, dispatch, batching — is real
  and tested; installing the libs makes the stub body the only change.
"""

from __future__ import annotations

import csv as _csv
import io
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ALLOWED_EXTENSIONS = {
    ".pdf", ".docx", ".pptx", ".ppt", ".xlsx", ".csv",
    ".jpg", ".jpeg", ".png", ".webp",
    ".txt", ".md",
    ".py", ".js", ".java", ".cpp", ".html", ".css", ".json", ".xml",
    ".yaml", ".yml", ".cs",
}

CODE_EXTENSIONS = {
    ".py", ".js", ".java", ".cpp", ".html", ".css", ".json", ".xml",
    ".yaml", ".yml",
}
BINARY_STUB_EXTENSIONS = {
    ".pdf", ".docx", ".pptx", ".ppt", ".xlsx",
    ".jpg", ".jpeg", ".png", ".webp",
}

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("extension", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("extractor_meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("error", T.StringType()),
    ]
)


def _decode_with_fallback(content: bytes) -> tuple[str, str]:
    """utf-8 → latin-1 → cp1252(replace), returning (text, encoding)."""
    try:
        return content.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        try:
            return content.decode("latin-1"), "latin-1"
        except UnicodeDecodeError:
            return content.decode("cp1252", errors="replace"), "cp1252"


def extract_one(path: str, content: bytes) -> tuple[str, dict[str, str], str | None]:
    """Extract (text, metadata, error) from one file's bytes."""
    ext = os.path.splitext(path)[1].lower()
    meta: dict[str, str] = {"file_size": str(len(content))}
    if ext not in ALLOWED_EXTENSIONS:
        return "", meta, f"unsupported extension: {ext}"
    try:
        if ext in (".txt", ".md"):
            return content.decode("utf-8", errors="ignore"), meta, None
        if ext in CODE_EXTENSIONS:
            meta["language"] = ext.lstrip(".")
            return content.decode("utf-8", errors="ignore"), meta, None
        if ext == ".cs":
            text = content.decode("utf-8", errors="ignore")
            meta["language"] = "cs"
            meta["line_count"] = str(len(text.splitlines()))
            for line in text.splitlines()[:20]:
                if line.strip().startswith("namespace "):
                    meta["namespace"] = line.strip().split()[1].rstrip(";")
                    break
            return text, meta, None
        if ext == ".csv":
            text_str, encoding = _decode_with_fallback(content)
            sample = text_str[:4096]
            try:
                dialect = _csv.Sniffer().sniff(sample)
                has_header = _csv.Sniffer().has_header(sample)
                delimiter = dialect.delimiter
            except _csv.Error:
                delimiter, has_header = ",", False
            rows, col_count = [], 0
            for row in _csv.reader(io.StringIO(text_str), delimiter=delimiter):
                if not row:
                    continue
                col_count = max(col_count, len(row))
                rows.append(" | ".join(cell.strip() for cell in row))
            meta.update(
                row_count=str(len(rows)),
                column_count=str(col_count),
                has_header=str(has_header),
                delimiter=delimiter,
                encoding=encoding,
            )
            return "\n".join(rows), meta, None
        if ext in BINARY_STUB_EXTENSIONS:
            # decode libraries not available in this container — see
            # module docstring; plumbing is real, decode is stubbed.
            raise NotImplementedError(
                f"binary decoder for {ext} not installed (pypdf/docx2txt/"
                "python-pptx/openpyxl/PIL+pytesseract)"
            )
        return "", meta, f"no extractor for {ext}"
    except NotImplementedError as e:
        return "", meta, str(e)
    except Exception as e:  # defensive: never fail the whole partition
        return "", meta, f"extraction error: {e}"


def extract_files_df(files: DataFrame) -> DataFrame:
    """binaryFile rows (path, content) → extracted text + metadata rows."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                text, meta, err = extract_one(row.path, row.content)
                recs.append(
                    {
                        "path": row.path,
                        "filename": os.path.basename(row.path),
                        "extension": os.path.splitext(row.path)[1].lower(),
                        "text": text,
                        "extractor_meta": meta,
                        "error": err,
                    }
                )
            yield pd.DataFrame(recs)

    return files.select("path", "content").mapInPandas(run, schema=EXTRACT_SCHEMA)


def read_binary_files(spark: SparkSession, input_dir: str, glob: str | None = None) -> DataFrame:
    """S1: the upload-dir scan as a binaryFile source (distributed file
    discovery replaces the reference's request-driven save,
    /root/reference/backend/ingestion.py:70-74)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(input_dir)
