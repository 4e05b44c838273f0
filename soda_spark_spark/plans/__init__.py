from .compiler import CompiledScan, compile_scan, type_category
from .definition import ScanDefinition, create_scan_definition

__all__ = ["CompiledScan", "compile_scan", "type_category", "ScanDefinition", "create_scan_definition"]
