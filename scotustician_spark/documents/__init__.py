from scotustician_spark.documents.chunks import assemble_section_chunks
from scotustician_spark.documents.flatten import (
    classify_speaker_role,
    flatten_utterances,
    split_quarantine,
)
from scotustician_spark.documents.schema import (
    OA_DOCUMENT,
    OA_DOCUMENT_WITH_CORRUPT,
    read_oa_json,
)
from scotustician_spark.documents.xml_sink import transcript_to_xml, write_xml

__all__ = [
    "OA_DOCUMENT",
    "OA_DOCUMENT_WITH_CORRUPT",
    "assemble_section_chunks",
    "classify_speaker_role",
    "flatten_utterances",
    "read_oa_json",
    "split_quarantine",
    "transcript_to_xml",
    "write_xml",
]
