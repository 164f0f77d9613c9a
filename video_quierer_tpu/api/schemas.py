"""API request/response schemas — shape parity with the reference's
Pydantic models (src/api/routes.py:56-139) so existing clients and the web
UI work unchanged."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pydantic import BaseModel, Field

from video_quierer_tpu.engine.config import ApiConfig


class SearchRequest(BaseModel):
    query: str = Field(..., description="Search query (text, or a "
                       "data:image/...;base64 URI for image search)")
    k: int = Field(5, ge=1, le=50)
    use_cache: bool = True
    # extension: at most one result per video (dead-path D6 capability)
    dedup_videos: bool = False
    # extension: pagination — results [offset, offset+k); offset+k must
    # stay within the device scan's top-MAX_K (64) page set
    offset: int = Field(0, ge=0, le=63)


class BatchSearchRequest(BaseModel):
    queries: List[str] = Field(..., min_length=1)
    k: int = Field(5, ge=1, le=50)


class SearchResponse(BaseModel):
    results: List[Dict[str, Any]]
    search_time_ms: float
    from_cache: bool = False
    query_id: str
    performance: Optional[Dict[str, Any]] = None


class ConfigurationResponse(BaseModel):
    success: bool
    config: Optional[ApiConfig] = None
    message: Optional[str] = None


class CacheStats(BaseModel):
    embeddings_count: int
    videos_count: int
    cache_size_mb: float
    last_updated: str
    cache_file_exists: bool
    video_hashes_count: int


class CacheResponse(BaseModel):
    success: bool
    stats: Optional[CacheStats] = None
    message: Optional[str] = None


class CacheHealthResult(BaseModel):
    success: bool
    issues: List[str]
    recommendations: List[str]
    total_checks: int
    passed_checks: int


class FrameResponse(BaseModel):
    success: bool
    frame_data: Optional[str] = None   # base64 data URI
    error: Optional[str] = None
    timestamp: float
    video_name: str
