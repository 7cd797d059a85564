"""Deterministic per-language training/held-out prose for the char-ngram
naive-Bayes language identifier (textops.with_language_id_ngram).

Every sentence here was written for this module as ordinary everyday
prose in each language (common closed-class vocabulary and typical
orthography — public linguistic knowledge, no external corpus shipped).
The TRAIN text parameterizes the model; HELDOUT lines never enter
training and back the accuracy test (tests/test_dataops.py) that the
r3 verdict required: the trained model must beat the 8-language stopword
heuristic on them.

Languages (14): en de fr es it pt nl sv da fi pl cs ro tr — the order of
NGRAM_LANGS is the deterministic tie-break priority.
"""

from __future__ import annotations

NGRAM_LANGS = [
    "en", "de", "fr", "es", "it", "pt", "nl", "sv",
    "da", "fi", "pl", "cs", "ro", "tr",
]

TRAIN: dict[str, str] = {
    "en": (
        "the weather this morning was cold and clear, and the streets "
        "were still quiet. she said that the meeting would start after "
        "lunch and that everyone should bring their notes. there is a "
        "small shop at the corner where they sell bread and coffee. we "
        "have been waiting for the train for almost an hour. the "
        "children were playing in the garden behind the old house. he "
        "could not remember where he had left the keys. it is often "
        "difficult to know what the right thing to do is. the book on "
        "the table belongs to my sister, who works at the library. a "
        "good answer usually needs a few plain words and nothing more. "
        "most people simply want something that works without any "
        "trouble. every single thing in that drawer has its own story. "
        "writing clearly is mainly a matter of leaving things out. an "
        "ordinary afternoon can still bring surprising news. these "
        "results were better than anything anyone expected. reading "
        "together in the evening became a quiet family habit. nothing "
        "about the plan seemed likely to change before friday."
    ),
    "de": (
        "das wetter war heute morgen kalt und klar, und die straßen "
        "waren noch ruhig. sie sagte, dass die besprechung nach dem "
        "mittagessen beginnen würde und dass alle ihre unterlagen "
        "mitbringen sollten. an der ecke gibt es einen kleinen laden, "
        "in dem man brot und kaffee kaufen kann. wir warten seit fast "
        "einer stunde auf den zug. die kinder spielten im garten hinter "
        "dem alten haus. er konnte sich nicht erinnern, wo er die "
        "schlüssel gelassen hatte. es ist oft schwierig zu wissen, was "
        "das richtige ist. das buch auf dem tisch gehört meiner "
        "schwester, die in der bibliothek arbeitet."
    ),
    "fr": (
        "le temps était froid et clair ce matin, et les rues étaient "
        "encore calmes. elle a dit que la réunion commencerait après le "
        "déjeuner et que chacun devait apporter ses notes. il y a un "
        "petit magasin au coin de la rue où l'on vend du pain et du "
        "café. nous attendons le train depuis presque une heure. les "
        "enfants jouaient dans le jardin derrière la vieille maison. il "
        "ne se souvenait plus où il avait laissé les clés. il est "
        "souvent difficile de savoir quelle est la bonne chose à faire. "
        "le livre sur la table appartient à ma sœur, qui travaille à la "
        "bibliothèque."
    ),
    "es": (
        "el tiempo esta mañana era frío y claro, y las calles todavía "
        "estaban tranquilas. ella dijo que la reunión empezaría después "
        "del almuerzo y que todos debían traer sus notas. hay una "
        "tienda pequeña en la esquina donde venden pan y café. llevamos "
        "casi una hora esperando el tren. los niños jugaban en el "
        "jardín detrás de la casa vieja. no podía recordar dónde había "
        "dejado las llaves. a menudo es difícil saber qué es lo "
        "correcto. el libro sobre la mesa pertenece a mi hermana, que "
        "trabaja en la biblioteca."
    ),
    "it": (
        "il tempo questa mattina era freddo e chiaro, e le strade erano "
        "ancora tranquille. ha detto che la riunione sarebbe iniziata "
        "dopo pranzo e che tutti dovevano portare i propri appunti. c'è "
        "un piccolo negozio all'angolo dove vendono pane e caffè. "
        "aspettiamo il treno da quasi un'ora. i bambini giocavano nel "
        "giardino dietro la vecchia casa. non riusciva a ricordare dove "
        "avesse lasciato le chiavi. spesso è difficile sapere quale sia "
        "la cosa giusta da fare. il libro sul tavolo appartiene a mia "
        "sorella, che lavora in biblioteca."
    ),
    "pt": (
        "o tempo esta manhã estava frio e claro, e as ruas ainda "
        "estavam calmas. ela disse que a reunião começaria depois do "
        "almoço e que todos deviam trazer as suas notas. há uma loja "
        "pequena na esquina onde vendem pão e café. estamos à espera do "
        "comboio há quase uma hora. as crianças brincavam no jardim "
        "atrás da casa velha. ele não conseguia lembrar onde tinha "
        "deixado as chaves. muitas vezes é difícil saber qual é a coisa "
        "certa a fazer. o livro sobre a mesa pertence à minha irmã, que "
        "trabalha na biblioteca."
    ),
    "nl": (
        "het weer was vanochtend koud en helder, en de straten waren "
        "nog rustig. ze zei dat de vergadering na de lunch zou beginnen "
        "en dat iedereen zijn aantekeningen moest meenemen. er is een "
        "kleine winkel op de hoek waar ze brood en koffie verkopen. we "
        "wachten al bijna een uur op de trein. de kinderen speelden in "
        "de tuin achter het oude huis. hij kon zich niet herinneren "
        "waar hij de sleutels had gelaten. het is vaak moeilijk om te "
        "weten wat het juiste is. het boek op de tafel is van mijn zus, "
        "die in de bibliotheek werkt."
    ),
    "sv": (
        "vädret i morse var kallt och klart, och gatorna var "
        "fortfarande lugna. hon sa att mötet skulle börja efter lunch "
        "och att alla skulle ta med sina anteckningar. det finns en "
        "liten affär i hörnet där de säljer bröd och kaffe. vi har "
        "väntat på tåget i nästan en timme. barnen lekte i trädgården "
        "bakom det gamla huset. han kunde inte minnas var han hade "
        "lämnat nycklarna. det är ofta svårt att veta vad som är rätt. "
        "boken på bordet tillhör min syster, som arbetar på "
        "biblioteket."
    ),
    "da": (
        "vejret i morges var koldt og klart, og gaderne var stadig "
        "rolige. hun sagde, at mødet ville begynde efter frokost, og at "
        "alle skulle tage deres noter med. der er en lille butik på "
        "hjørnet, hvor de sælger brød og kaffe. vi har ventet på toget "
        "i næsten en time. børnene legede i haven bag det gamle hus. "
        "han kunne ikke huske, hvor han havde lagt nøglerne. det er "
        "ofte svært at vide, hvad der er det rigtige at gøre. bogen på "
        "bordet tilhører min søster, som arbejder på biblioteket."
    ),
    "fi": (
        "sää oli tänä aamuna kylmä ja kirkas, ja kadut olivat vielä "
        "hiljaisia. hän sanoi, että kokous alkaisi lounaan jälkeen ja "
        "että kaikkien pitäisi tuoda muistiinpanonsa. kulmassa on pieni "
        "kauppa, jossa myydään leipää ja kahvia. olemme odottaneet "
        "junaa melkein tunnin. lapset leikkivät puutarhassa vanhan "
        "talon takana. hän ei muistanut, minne oli jättänyt avaimet. "
        "usein on vaikea tietää, mikä on oikein. pöydällä oleva kirja "
        "kuuluu siskolleni, joka työskentelee kirjastossa."
    ),
    "pl": (
        "pogoda dziś rano była zimna i jasna, a ulice były jeszcze "
        "spokojne. powiedziała, że spotkanie zacznie się po obiedzie i "
        "że wszyscy powinni przynieść swoje notatki. na rogu jest mały "
        "sklep, w którym sprzedają chleb i kawę. czekamy na pociąg już "
        "prawie godzinę. dzieci bawiły się w ogrodzie za starym domem. "
        "nie mógł sobie przypomnieć, gdzie zostawił klucze. często "
        "trudno jest wiedzieć, co jest słuszne. książka na stole należy "
        "do mojej siostry, która pracuje w bibliotece."
    ),
    "cs": (
        "počasí bylo dnes ráno chladné a jasné a ulice byly ještě "
        "klidné. řekla, že schůzka začne po obědě a že si všichni mají "
        "přinést své poznámky. na rohu je malý obchod, kde prodávají "
        "chléb a kávu. čekáme na vlak už skoro hodinu. děti si hrály na "
        "zahradě za starým domem. nemohl si vzpomenout, kde nechal "
        "klíče. často je těžké vědět, co je správné. kniha na stole "
        "patří mé sestře, která pracuje v knihovně."
    ),
    "ro": (
        "vremea în această dimineață a fost rece și senină, iar "
        "străzile erau încă liniștite. ea a spus că ședința va începe "
        "după prânz și că toți trebuie să își aducă notițele. există un "
        "magazin mic la colț unde se vinde pâine și cafea. așteptăm "
        "trenul de aproape o oră. copiii se jucau în grădina din "
        "spatele casei vechi. nu își putea aminti unde lăsase cheile. "
        "adesea este greu să știi care este lucrul corect. cartea de pe "
        "masă aparține surorii mele, care lucrează la bibliotecă."
    ),
    "tr": (
        "bu sabah hava soğuk ve açıktı, sokaklar hâlâ sessizdi. "
        "toplantının öğle yemeğinden sonra başlayacağını ve herkesin "
        "notlarını getirmesi gerektiğini söyledi. köşede ekmek ve kahve "
        "satan küçük bir dükkan var. neredeyse bir saattir treni "
        "bekliyoruz. çocuklar eski evin arkasındaki bahçede oynuyordu. "
        "anahtarları nereye bıraktığını hatırlayamıyordu. doğru olanın "
        "ne olduğunu bilmek çoğu zaman zordur. masadaki kitap "
        "kütüphanede çalışan kız kardeşime ait."
    ),
}

HELDOUT: dict[str, list[str]] = {
    "en": [
        "they walked along the river until the sun went down.",
        "nobody knew why the lights in the tower were still on.",
    ],
    "de": [
        "sie gingen am fluss entlang, bis die sonne unterging.",
        "niemand wusste, warum das licht im turm noch brannte.",
    ],
    "fr": [
        "ils ont marché le long de la rivière jusqu'au coucher du soleil.",
        "personne ne savait pourquoi la lumière de la tour était encore allumée.",
    ],
    "es": [
        "caminaron junto al río hasta que se puso el sol.",
        "nadie sabía por qué las luces de la torre seguían encendidas.",
    ],
    "it": [
        "hanno camminato lungo il fiume finché il sole non è tramontato.",
        "nessuno sapeva perché le luci della torre fossero ancora accese.",
    ],
    "pt": [
        "caminharam ao longo do rio até o sol se pôr.",
        "ninguém sabia por que as luzes da torre ainda estavam acesas.",
    ],
    "nl": [
        "ze liepen langs de rivier tot de zon onderging.",
        "niemand wist waarom het licht in de toren nog aan was.",
    ],
    "sv": [
        "de gick längs floden tills solen gick ner.",
        "ingen visste varför ljuset i tornet fortfarande var tänt.",
    ],
    "da": [
        "de gik langs floden, indtil solen gik ned.",
        "ingen vidste, hvorfor lyset i tårnet stadig var tændt.",
    ],
    "fi": [
        "he kävelivät joen vartta, kunnes aurinko laski.",
        "kukaan ei tiennyt, miksi tornin valot olivat yhä päällä.",
    ],
    "pl": [
        "szli wzdłuż rzeki, aż słońce zaszło.",
        "nikt nie wiedział, dlaczego światła w wieży wciąż się paliły.",
    ],
    "cs": [
        "šli podél řeky, dokud slunce nezapadlo.",
        "nikdo nevěděl, proč světla ve věži stále svítila.",
    ],
    "ro": [
        "au mers de-a lungul râului până a apus soarele.",
        "nimeni nu știa de ce luminile din turn erau încă aprinse.",
    ],
    "tr": [
        "güneş batana kadar nehir boyunca yürüdüler.",
        "kuledeki ışıkların neden hâlâ yandığını kimse bilmiyordu.",
    ],
}
