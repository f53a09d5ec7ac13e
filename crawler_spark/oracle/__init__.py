"""Golden oracle: synthetic fixtures + a sequential reference crawler.

The oracle is a literal transcription of the reference's scheduling
semantics (``src/lib/crawler/checkpoint.ts:157-196``, priority sort
``src/lib/crawler/sortUtils.ts:9-21``, completion rules
``crawler.ts:503-509``) extended with the graft's explicit politeness /
robots / canonicalization spec. The Spark engine must reproduce its
crawl ordering, URL-seen set, and image+caption extractions exactly.
"""
