"""Shared oracle-SQL fragments used by more than one query module.

Lives in its own leaf module so `llm_queries` and `etl_queries` can both
import it regardless of which of them loads first (they are imported for
side effects from the bottom of `registry`, so import order depends on the
caller's entry point)."""

_LANG_SCORE_SQL = """
      SELECT doc_id, lang,
             len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS s_en,
             len(list_filter(string_split(text,' '), t -> t IN ('le','la','et','de','un','les','des'))) AS s_fr,
             len(list_filter(string_split(text,' '), t -> t IN ('el','los','y','una','que','por'))) AS s_es,
             len(list_filter(string_split(text,' '), t -> t IN ('der','die','und','das','ein','nicht'))) AS s_de
      FROM documents
"""
