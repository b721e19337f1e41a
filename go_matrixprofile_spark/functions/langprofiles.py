"""Character-trigram language profiles (Cavnar & Trenkle 1994,
"N-Gram-Based Text Categorization").

Each language's profile is DERIVED at import from the embedded seed
text: normalize (lowercase, every non-[a-z] char → space, pad), count
overlapping character trigrams, keep the N_PROF most frequent ranked by
(-count, trigram) so the table is bit-deterministic. Classification is
the classic out-of-place rank distance: rank the document's own top
K_DOC trigrams the same way, then for each language sum
|doc_rank − profile_rank| over the document's trigrams with an N_PROF
penalty for trigrams absent from the profile; the language with the
smallest distance wins (ties → lexicographically first language code),
'und' when no document trigram matches any profile entry.

The profiles replace the r03 marker-word heuristic ("the/la/der/le"
voting), which missed any sentence avoiding those exact words; rank
profiles carry signal from EVERY word's character sequences. All
ranking and distance math is integer, so the Spark plan and the DuckDB
oracle agree bit-for-bit.
"""

from __future__ import annotations

import re
from collections import Counter

N_PROF = 150  # profile length per language (and the absent-penalty)
K_DOC = 60  # document profile length

# Original seed sentences (written for this fixture): everyday prose in
# each language, varied constructions (articles, plurals, gerunds,
# noun lists) for stable trigram statistics.
SEED_TEXT = {
    "en": """
the quick brown fox jumps over the lazy dog while the other dogs watch
she is running and jumping in the garden with the children this morning
engineers are testing new systems and checking results again carefully
there will be another meeting in the afternoon about the training data
weather in the mountains is colder than weather near the coast today
reading and writing are things that students practice every single day
answers to difficult questions depend on meanings of many other words
they are building another bridge over the river near the old station
workers finished painting walls and cleaning floors early this evening
several colleagues mentioned that progress happens gradually sometimes
computers process information quickly but people imagine possibilities
neighbors bought apples oranges plums and grapes at village markets
writing tests helps with finding mistakes early during development
friends gathered around tables sharing stories about distant journeys
scientists discovered interesting patterns hidden inside large datasets
children played games outside until parents called them home for dinner
mornings start slowly with coffee newspapers and quiet conversations
companies announced plans for expanding operations across many regions
travelers packed bags checked tickets and waited patiently at stations
teachers explained lessons while students asked thoughtful questions
""",
    "es": """
el perro corre por la calle mientras los otros perros miran la casa
ella esta corriendo y saltando en el jardin con los ninos esta manana
los ingenieros estan probando el nuevo sistema y revisando los datos
habra otra reunion por la tarde sobre los datos de entrenamiento
el tiempo en las montanas es mas frio que el tiempo cerca de la costa
leer y escribir son las cosas que los estudiantes practican cada dia
la respuesta a la pregunta depende del significado de las otras palabras
estan construyendo otro puente sobre el rio cerca de la estacion vieja
muchos companeros dijeron que conseguimos buenos resultados juntos
mi vecino compro manzanas naranjas ciruelas y uvas en el mercado ayer
los amigos se reunieron alrededor de las mesas compartiendo historias
los cientificos descubrieron patrones interesantes en grandes datos
los ninos jugaron afuera hasta que sus padres los llamaron a cenar
las mananas empiezan despacio con cafe periodicos y conversaciones
las empresas anunciaron planes para expandir operaciones en regiones
los viajeros hicieron maletas revisaron boletos y esperaron en la estacion
los maestros explicaron lecciones mientras los estudiantes preguntaban
""",
    "de": """
der hund lauft durch die strasse wahrend die anderen hunde das haus sehen
sie rennt und springt heute morgen mit den kindern in dem garten
die ingenieure testen das neue system und prufen wieder die ergebnisse
es wird am nachmittag noch ein treffen uber die trainingsdaten geben
das wetter in den bergen ist kalter als das wetter an der kuste
lesen und schreiben sind die dinge die die studenten jeden tag uben
die antwort auf die frage hangt von der bedeutung der anderen worter ab
sie bauen eine weitere brucke uber den fluss bei dem alten bahnhof
mehrere kollegen sagten dass fortschritt allmahlich entsteht
mein nachbar kaufte gestern apfel orangen pflaumen und trauben
die freunde versammelten sich um die tische und erzahlten geschichten
die wissenschaftler entdeckten interessante muster in grossen daten
die kinder spielten draussen bis die eltern sie zum abendessen riefen
die morgen beginnen langsam mit kaffee zeitungen und gesprachen
die firmen kundigten plane fur die erweiterung in vielen regionen an
die reisenden packten taschen pruften karten und warteten am bahnhof
die lehrer erklarten den unterricht wahrend die schuler fragen stellten
""",
    "fr": """
le chien court dans la rue pendant que les autres chiens regardent la maison
elle court et saute ce matin dans le jardin avec les enfants
les ingenieurs testent le nouveau systeme et verifient encore les resultats
il y aura une autre reunion cet apres midi sur les donnees de formation
le temps dans les montagnes est plus froid que le temps pres de la cote
lire et ecrire sont les choses que les etudiants pratiquent chaque jour
la reponse a la question depend du sens des autres mots de la phrase
ils construisent un autre pont sur le fleuve pres de la vieille gare
plusieurs collegues disaient que nous obtenons de bons resultats
mon voisin a achete des pommes des oranges des prunes et du raisin hier
les amis se sont reunis autour des tables en partageant des histoires
les scientifiques ont decouvert des motifs interessants dans les donnees
les enfants ont joue dehors jusqu au moment du diner avec leurs parents
les matins commencent lentement avec du cafe et des conversations
les entreprises ont annonce des plans pour etendre leurs operations
les voyageurs ont fait leurs valises et attendu a la gare longtemps
les professeurs expliquaient les lecons pendant que les eleves posaient
""",
}


def normalize(text: str) -> str:
    """The exact normalization the engine and the oracle apply:
    lowercase, every non-[a-z] char becomes a space, one-space pad."""
    return " " + re.sub(r"[^a-z]", " ", text.lower()) + " "


def _ranked_trigrams(text: str, k: int) -> dict[str, int]:
    norm = normalize(text)
    counts = Counter(norm[i : i + 3] for i in range(len(norm) - 2))
    counts.pop("   ", None)  # whitespace runs carry no signal
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {tri: r for r, (tri, _) in enumerate(top)}


def build_profiles(
    seed: dict[str, str] | None = None, n_prof: int = N_PROF
) -> dict[str, dict[str, int]]:
    """{lang: {trigram: rank}} — rank 0 = most frequent."""
    seed = SEED_TEXT if seed is None else seed
    return {lang: _ranked_trigrams(text, n_prof) for lang, text in seed.items()}


PROFILES: dict[str, dict[str, int]] = build_profiles()


def predict(text: str, profiles=None) -> str:
    """Reference prediction with the engine's exact semantics: smallest
    out-of-place distance, ties → lexicographically first language,
    'und' when no trigram matches any profile."""
    profiles = PROFILES if profiles is None else profiles
    dp = _ranked_trigrams(text, K_DOC)
    if not dp:
        return "und"
    best = None
    for lang in sorted(profiles):
        dist, matched = 0, 0
        for tri, r in dp.items():
            pr = profiles[lang].get(tri)
            if pr is None:
                dist += N_PROF
            else:
                dist += abs(r - pr)
                matched += 1
        if best is None or (dist, lang) < best[:2]:
            best = (dist, lang, matched)
    return best[1] if best[2] > 0 else "und"
