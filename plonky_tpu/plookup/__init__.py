from .plookup import prove, verify, sort_by, pad_inputs, grand_polynomial
from .proof import Opening, PlookupChallenge, PlookupOpenings, PlookupProof
from .table import Table
