"""Heterogeneous modality assignment (parity: opencood/modality_assign/*.json
+ utils/heter_utils.Adaptor:12-117).

Assignment JSON maps scenario -> cav_id -> modality name ("m1".."m4"); the
adaptor reorders the cav list so the ego's modality comes first, filters
cavs whose assigned modality is not deployed (mapping_dict value "none"),
and converts names to the model's modality indices.
"""

import json
from typing import Dict, List, Optional, Sequence


class ModalityAdaptor:
    def __init__(self, assignment_path: Optional[str],
                 ego_modality: str,
                 mapping_dict: Dict[str, str],
                 model_modalities: Sequence[str]):
        """mapping_dict: assigned name -> deployed name or 'none' (drop)."""
        self.assignment = (
            json.load(open(assignment_path)) if assignment_path else {}
        )
        self.ego_modality = ego_modality
        self.mapping = mapping_dict
        self.index_of = {m: i for i, m in enumerate(model_modalities)}

    def modality_of(self, scenario: str, cav_id: str) -> Optional[str]:
        raw = self.assignment.get(scenario, {}).get(cav_id)
        mapped = self.mapping.get(raw, raw)
        if mapped in (None, "none"):
            return None
        return mapped

    def reorder_cav_list(self, cav_list: List[str], scenario: str):
        """Ego-modality cavs first, unmapped modalities dropped
        (heter_utils.Adaptor.reorder_cav_list parity)."""
        kept = [(c, self.modality_of(scenario, c)) for c in cav_list]
        kept = [(c, m) for c, m in kept if m is not None]
        ego_first = [c for c, m in kept if m == self.ego_modality]
        others = [c for c, m in kept if m != self.ego_modality]
        return ego_first + others

    def modality_indices(self, cav_list: List[str], scenario: str):
        """-> list of model modality indices aligned with cav_list."""
        out = []
        for c in cav_list:
            m = self.modality_of(scenario, c)
            out.append(self.index_of.get(m, 0))
        return out
