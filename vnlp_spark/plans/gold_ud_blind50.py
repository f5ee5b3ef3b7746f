"""Fiftieth BLIND gold split — round 4 closer (blind-49 scored 0.857
first-run on fresh artisanal vocabulary; the inventory has since been
hardened by two bulk valency sweeps — this split measures the result
on yet-fresh domains).

Protocol (same as gold_ud_blind{,2..49}.py): these 20 NEW sentences were
written and UD-annotated by hand from the conventions list in
gold_ud.py's docstring, and are COMMITTED BEFORE the engine touches them
in any way.  The first-run score is recorded as-is in BENCH.md
regardless of outcome.  Pre-freeze vetting was single-word lexicon
coverage only (zero out-of-lexicon words); the parser was not run on
any candidate sentence.

Register: REPRESENTATIVE web-news prose over fresh domains (marine,
aviation, textile, publishing, horticulture): izafet subjects before
ambiguous plural-Acc objects (Tersane işçileri kaynak dikişlerini;
Havayolu personeli valizleri); sweep-verb probes in ambiguous frames
(soğuttu, yoğurdu, şifreledi, yedekledi, denedi, tekrarladı);
material modifiers (bakır kabloları, yün iplikleri); quality-dual
attributives (yazlık kıyafetleri); dual-stem attributives before
re-resolvable heads (çatlak vazoyu); kal-participle bequests (emanet
kalan yüzüğü); Gen-through-ADJ subjects (Geminin eski motoru);
tarafından chains (liman başkanlığı tarafından); focal ancak;
grammaticalized ADPs (süresince is avoided — boyunca, sonra);
LVC predicates (monte etti, rapor etti).

Convention notes made BEFORE scoring, where the list is silent:
material nouns (bakır, yün) modify as NOUN+nmod; 'yazlık' is the
NomDq quality-dual ADJ; 'ancak' mid-sentence with no left clause is
the focalizer ADV.
"""
from typing import List

BLIND50: List[dict] = [
    dict(
        text="Tersane işçileri kaynak dikişlerini tek tek kontrol etti.",
        tokens=["Tersane", "işçileri", "kaynak", "dikişlerini", "tek",
                "tek", "kontrol", "etti", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "ADV", "ADV", "NOUN",
              "VERB", "PUNCT"],
        heads=[2, 8, 4, 8, 8, 5, 8, 0, 8],
        deprels=["nmod", "nsubj", "nmod", "obj", "advmod", "compound",
                 "compound", "root", "punct"],
    ),
    dict(
        text="Havayolu personeli valizleri yeni sisteme kaydetti.",
        tokens=["Havayolu", "personeli", "valizleri", "yeni",
                "sisteme", "kaydetti", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "obj", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Sütçü kaymağı mermer tezgahta soğuttu.",
        tokens=["Sütçü", "kaymağı", "mermer", "tezgahta", "soğuttu",
                "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 5, 4, 5, 0, 5],
        deprels=["nsubj", "obj", "nmod", "obl", "root", "punct"],
    ),
    dict(
        text="Pideci hamuru sabah erken yoğurdu.",
        tokens=["Pideci", "hamuru", "sabah", "erken", "yoğurdu", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "VERB", "PUNCT"],
        heads=[5, 5, 5, 5, 0, 5],
        deprels=["nsubj", "obj", "obl", "advmod", "root", "punct"],
    ),
    dict(
        text="Elektrikçi bakır kabloları duvar kanalına döşedi.",
        tokens=["Elektrikçi", "bakır", "kabloları", "duvar",
                "kanalına", "döşedi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "nmod", "obj", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Dokumacı yün iplikleri doğal boyayla renklendirdi.",
        tokens=["Dokumacı", "yün", "iplikleri", "doğal", "boyayla",
                "renklendirdi", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "nmod", "obj", "amod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Butik yazlık kıyafetleri vitrine taşıdı.",
        tokens=["Butik", "yazlık", "kıyafetleri", "vitrine", "taşıdı",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Antikacı çatlak vazoyu ustaya gönderdi.",
        tokens=["Antikacı", "çatlak", "vazoyu", "ustaya", "gönderdi",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[5, 3, 5, 5, 0, 5],
        deprels=["nsubj", "amod", "obj", "obl", "root", "punct"],
    ),
    dict(
        text="Dedeye emanet kalan yüzüğü kuyumcu parlattı.",
        tokens=["Dedeye", "emanet", "kalan", "yüzüğü", "kuyumcu",
                "parlattı", "."],
        upos=["NOUN", "NOUN", "VERB", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 4, 6, 6, 0, 6],
        deprels=["obl", "compound", "acl", "obj", "nsubj", "root",
                 "punct"],
    ),
    dict(
        text="Geminin eski motoru bakımda yenilendi.",
        tokens=["Geminin", "eski", "motoru", "bakımda", "yenilendi",
                "."],
        upos=["NOUN", "ADJ", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[3, 3, 5, 5, 0, 5],
        deprels=["nmod", "amod", "nsubj", "obl", "root", "punct"],
    ),
    dict(
        text="Rıhtım ışıkları liman başkanlığı tarafından yenilendi.",
        tokens=["Rıhtım", "ışıkları", "liman", "başkanlığı",
                "tarafından", "yenilendi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 4, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "nmod", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Muhasebe birimi kayıtları her akşam yedekledi.",
        tokens=["Muhasebe", "birimi", "kayıtları", "her", "akşam",
                "yedekledi", "."],
        upos=["NOUN", "NOUN", "NOUN", "DET", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 6, 5, 6, 0, 6],
        deprels=["nmod", "nsubj", "obj", "det", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Kurum yazışmaları güvenlik için şifreledi.",
        tokens=["Kurum", "yazışmaları", "güvenlik", "için",
                "şifreledi", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADP", "VERB", "PUNCT"],
        heads=[5, 5, 5, 3, 0, 5],
        deprels=["nsubj", "obj", "obl", "case", "root", "punct"],
    ),
    dict(
        text="Pilot adayı iniş takımlarını simülatörde denedi.",
        tokens=["Pilot", "adayı", "iniş", "takımlarını",
                "simülatörde", "denedi", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["nmod", "nsubj", "nmod", "obj", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Sunucu hava durumunu ancak gece tekrarladı.",
        tokens=["Sunucu", "hava", "durumunu", "ancak", "gece",
                "tekrarladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADV", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 6, 0, 6],
        deprels=["nsubj", "nmod", "obj", "advmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Montajcı güneş panellerini çatıya monte etti.",
        tokens=["Montajcı", "güneş", "panellerini", "çatıya", "monte",
                "etti", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 6, 0, 6],
        deprels=["nsubj", "nmod", "obj", "obl", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Gözlemciler sayım sonuçlarını merkeze rapor etti.",
        tokens=["Gözlemciler", "sayım", "sonuçlarını", "merkeze",
                "rapor", "etti", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 6, 6, 0, 6],
        deprels=["nsubj", "nmod", "obj", "obl", "compound", "root",
                 "punct"],
    ),
    dict(
        text="Fidanlık sahibi gül fidanlarını baharda aşıladı.",
        tokens=["Fidanlık", "sahibi", "gül", "fidanlarını", "baharda",
                "aşıladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[2, 6, 4, 6, 6, 0, 6],
        deprels=["nmod", "nsubj", "nmod", "obj", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Ciltçi yıpranan kapakları deri parçalarıyla onardı.",
        tokens=["Ciltçi", "yıpranan", "kapakları", "deri",
                "parçalarıyla", "onardı", "."],
        upos=["NOUN", "VERB", "NOUN", "NOUN", "NOUN", "VERB", "PUNCT"],
        heads=[6, 3, 6, 5, 6, 0, 6],
        deprels=["nsubj", "acl", "obj", "nmod", "obl", "root",
                 "punct"],
    ),
    dict(
        text="Sahil güvenlik botları kaçak ağları sabaha karşı topladı.",
        tokens=["Sahil", "güvenlik", "botları", "kaçak", "ağları",
                "sabaha", "karşı", "topladı", "."],
        upos=["NOUN", "NOUN", "NOUN", "ADJ", "NOUN", "NOUN", "ADP",
              "VERB", "PUNCT"],
        heads=[2, 3, 8, 5, 8, 8, 6, 0, 8],
        deprels=["nmod", "nmod", "nsubj", "amod", "obj", "obl", "case",
                 "root", "punct"],
    ),
]
